#!/usr/bin/env bash
# Build the MERGE-capable in-memory catalog double (round-10 VERDICT #6)
# against the pyspark distribution's own jars. Output:
# acid_double/graft-acid-double.jar (gitignored; rebuilt on demand —
# tests/conftest.py invokes this before the Spark JVM starts when javac
# is available and the jar is missing/stale).
set -euo pipefail
cd "$(dirname "$0")"

JARS=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'jars'))")
CP=$(ls "$JARS"/spark-sql-api_*.jar "$JARS"/spark-catalyst_*.jar \
      "$JARS"/spark-sql_*.jar "$JARS"/spark-core_*.jar \
      "$JARS"/spark-unsafe_*.jar "$JARS"/spark-common-utils_*.jar \
      "$JARS"/scala-library-*.jar "$JARS"/kryo-shaded-*.jar 2>/dev/null | paste -sd:)

rm -rf classes && mkdir -p classes
javac -encoding UTF-8 -cp "$CP" -d classes src/sparkgraft/acid/MemoryRowLevelCatalog.java
jar cf graft-acid-double.jar -C classes .
echo "built $(pwd)/graft-acid-double.jar"
