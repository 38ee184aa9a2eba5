package sparkgraft.acid;

/*
 * In-memory DataSource-V2 catalog whose tables implement
 * SupportsRowLevelOperations — the minimal MERGE-capable table Spark's
 * RewriteMergeIntoTable group-based (copy-on-write) path can plan against.
 *
 * Purpose (round-10 VERDICT #6): this sandbox has no PyPI route, so
 * delta-spark / iceberg-runtime cannot be installed and the engine's
 * merge_into_table MERGE INTO branch (plans/merge.py) had no executed
 * path. This double executes it FOR REAL: Spark analyzes the MERGE INTO
 * statement, plans ReplaceData over this table's scan, runs the join, and
 * commits through this table's BatchWrite — the identical engine-side code
 * path an ACID format rides, with the format's file machinery replaced by
 * a snapshot-atomic in-memory row store (one "group" = the whole table,
 * the degenerate copy-on-write granularity).
 *
 * Deliberately NOT implemented: SupportsDelta (merge-on-read), runtime
 * group filtering, column pruning, filter pushdown — Spark compensates
 * with Project/Filter on top, and the semantics under test (keyed
 * matched-UPDATE / not-matched-INSERT with an exactly-once counter bump)
 * don't depend on them.
 *
 * Written against the public DSv2 interfaces of Apache Spark 4.1
 * (org.apache.spark.sql.connector.*). Reference semantics:
 * scrapper.py:196-206 (INSERT .. ON CONFLICT .. nupdates+1), re-expressed
 * as MERGE INTO by plans/merge.build_merge_into_sql.
 */

import java.io.IOException;
import java.io.Serializable;
import java.util.ArrayList;
import java.util.Arrays;
import java.util.HashMap;
import java.util.List;
import java.util.Map;
import java.util.Set;
import java.util.concurrent.ConcurrentHashMap;

import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException;
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException;
import org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException;
import org.apache.spark.sql.connector.catalog.Identifier;
import org.apache.spark.sql.connector.catalog.MetadataColumn;
import org.apache.spark.sql.connector.catalog.SupportsMetadataColumns;
import org.apache.spark.sql.connector.catalog.SupportsNamespaces;
import org.apache.spark.sql.connector.catalog.SupportsRead;
import org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations;
import org.apache.spark.sql.connector.catalog.SupportsWrite;
import org.apache.spark.sql.connector.catalog.Table;
import org.apache.spark.sql.connector.catalog.TableCapability;
import org.apache.spark.sql.connector.catalog.TableCatalog;
import org.apache.spark.sql.connector.catalog.TableChange;
import org.apache.spark.sql.connector.catalog.TruncatableTable;
import org.apache.spark.sql.connector.catalog.NamespaceChange;
import org.apache.spark.sql.connector.expressions.Expressions;
import org.apache.spark.sql.connector.expressions.NamedReference;
import org.apache.spark.sql.connector.expressions.Transform;
import org.apache.spark.sql.connector.read.Batch;
import org.apache.spark.sql.connector.read.InputPartition;
import org.apache.spark.sql.connector.read.PartitionReader;
import org.apache.spark.sql.connector.read.PartitionReaderFactory;
import org.apache.spark.sql.connector.read.Scan;
import org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.write.BatchWrite;
import org.apache.spark.sql.connector.write.DataWriter;
import org.apache.spark.sql.connector.write.DataWriterFactory;
import org.apache.spark.sql.connector.write.LogicalWriteInfo;
import org.apache.spark.sql.connector.write.PhysicalWriteInfo;
import org.apache.spark.sql.connector.write.RowLevelOperation;
import org.apache.spark.sql.connector.write.RowLevelOperationBuilder;
import org.apache.spark.sql.connector.write.RowLevelOperationInfo;
import org.apache.spark.sql.connector.write.SupportsTruncate;
import org.apache.spark.sql.connector.write.Write;
import org.apache.spark.sql.connector.write.WriteBuilder;
import org.apache.spark.sql.connector.write.WriterCommitMessage;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.StructField;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.unsafe.types.UTF8String;
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;

public class MemoryRowLevelCatalog implements TableCatalog, SupportsNamespaces {

  /** Table state lives JVM-wide so every catalog instance (Spark may
   *  construct several) sees one store. Key = catalog.ns.table. */
  private static final Map<String, MemTable> TABLES = new ConcurrentHashMap<>();

  private String catalogName = "graftmem";

  @Override
  public void initialize(String name, CaseInsensitiveStringMap options) {
    this.catalogName = name;
  }

  @Override
  public String name() {
    return catalogName;
  }

  private String key(Identifier ident) {
    return catalogName + "." + String.join(".", ident.namespace()) + "." + ident.name();
  }

  @Override
  public Identifier[] listTables(String[] namespace) {
    List<Identifier> out = new ArrayList<>();
    String prefix = catalogName + "." + String.join(".", namespace) + ".";
    for (Map.Entry<String, MemTable> e : TABLES.entrySet()) {
      if (e.getKey().startsWith(prefix)) {
        out.add(Identifier.of(namespace, e.getValue().shortName));
      }
    }
    return out.toArray(new Identifier[0]);
  }

  @Override
  public Table loadTable(Identifier ident) throws NoSuchTableException {
    MemTable t = TABLES.get(key(ident));
    if (t == null) {
      throw new NoSuchTableException(ident);
    }
    return t;
  }

  @Override
  public boolean tableExists(Identifier ident) {
    return TABLES.containsKey(key(ident));
  }

  @Override
  public Table createTable(
      Identifier ident, StructType schema, Transform[] partitions, Map<String, String> properties)
      throws TableAlreadyExistsException {
    String k = key(ident);
    if (TABLES.containsKey(k)) {
      throw new TableAlreadyExistsException(ident);
    }
    MemTable t = new MemTable(k, ident.name(), schema, new HashMap<>(properties));
    TABLES.put(k, t);
    return t;
  }

  @Override
  public Table alterTable(Identifier ident, TableChange... changes) {
    throw new UnsupportedOperationException("ALTER TABLE not supported by the merge double");
  }

  @Override
  public boolean dropTable(Identifier ident) {
    return TABLES.remove(key(ident)) != null;
  }

  @Override
  public void renameTable(Identifier oldIdent, Identifier newIdent) {
    throw new UnsupportedOperationException("RENAME not supported by the merge double");
  }

  // ----- SupportsNamespaces: a single flat, always-existing namespace -----

  @Override
  public String[][] listNamespaces() {
    return new String[][] {new String[] {"default"}};
  }

  @Override
  public String[][] listNamespaces(String[] namespace) throws NoSuchNamespaceException {
    return new String[0][];
  }

  @Override
  public boolean namespaceExists(String[] namespace) {
    return true; // every namespace exists: keeps USE/CREATE paths trivial
  }

  @Override
  public Map<String, String> loadNamespaceMetadata(String[] namespace) {
    return new HashMap<>();
  }

  @Override
  public void createNamespace(String[] namespace, Map<String, String> metadata) {}

  @Override
  public void alterNamespace(String[] namespace, NamespaceChange... changes) {}

  @Override
  public boolean dropNamespace(String[] namespace, boolean cascade) {
    return true;
  }

  // ======================= table =======================

  /** The degenerate group-id metadata column: real formats expose _file /
   *  _pos so the rewrite can target groups; here one group = the whole
   *  table, so the column is a constant. Declaring it matters anyway:
   *  Spark builds the ReplaceData metadata projection ONLY when the
   *  operation requires metadata attributes, and that projection is what
   *  routes writer rows through ProjectingInternalRow instead of handing
   *  the raw tagged MergeRows output (leading __row_operation int) to the
   *  connector (observed: 5-field UnsafeRows garbling a 4-col table). */
  static final String GROUP_COL = "_group";

  static class MemTable
      implements Table,
          SupportsRead,
          SupportsWrite,
          SupportsRowLevelOperations,
          SupportsMetadataColumns,
          TruncatableTable {
    final String fullName;
    final String shortName;
    final StructType schema;
    final Map<String, String> props;
    // the snapshot: replaced atomically by commits (synchronized on this)
    volatile List<InternalRow> rows = new ArrayList<>();

    MemTable(String fullName, String shortName, StructType schema, Map<String, String> props) {
      this.fullName = fullName;
      this.shortName = shortName;
      this.schema = schema;
      this.props = props;
    }

    @Override
    public String name() {
      return fullName;
    }

    @Override
    public StructType schema() {
      return schema;
    }

    @Override
    public Map<String, String> properties() {
      return props;
    }

    @Override
    public Set<TableCapability> capabilities() {
      return Set.of(
          TableCapability.BATCH_READ,
          TableCapability.BATCH_WRITE,
          TableCapability.TRUNCATE);
    }

    @Override
    public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
      return new MemScanBuilder(this);
    }

    @Override
    public MetadataColumn[] metadataColumns() {
      return new MetadataColumn[] {
        new MetadataColumn() {
          @Override
          public String name() {
            return GROUP_COL;
          }

          @Override
          public DataType dataType() {
            return DataTypes.StringType;
          }

          @Override
          public boolean isNullable() {
            return false;
          }
        }
      };
    }

    @Override
    public WriteBuilder newWriteBuilder(LogicalWriteInfo info) {
      // plain writes append (INSERT INTO); MERGE goes through the
      // row-level operation's ReplaceWriteBuilder below
      return new MemWriteBuilder(this, false);
    }

    @Override
    public RowLevelOperationBuilder newRowLevelOperationBuilder(RowLevelOperationInfo info) {
      RowLevelOperation.Command cmd = info.command();
      MemTable self = this;
      return () ->
          new RowLevelOperation() {
            @Override
            public Command command() {
              return cmd;
            }

            @Override
            public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
              // one group = the whole table: the rewrite reads everything
              return new MemScanBuilder(self);
            }

            @Override
            public NamedReference[] requiredMetadataAttributes() {
              return new NamedReference[] {Expressions.column(GROUP_COL)};
            }

            @Override
            public WriteBuilder newWriteBuilder(LogicalWriteInfo writeInfo) {
              // ...and the ReplaceData write swaps the whole snapshot
              return new MemWriteBuilder(self, true);
            }
          };
    }

    synchronized void commitRows(List<InternalRow> fresh, boolean replace) {
      List<InternalRow> next = replace ? new ArrayList<>() : new ArrayList<>(rows);
      next.addAll(fresh);
      rows = next; // volatile store: snapshot-atomic swap
    }

    // TRUNCATE TABLE rides TruncatableTable (the WriteBuilder's
    // SupportsTruncate only covers INSERT OVERWRITE's truncate-then-
    // append write); same snapshot-atomic swap as every other commit.
    @Override
    public boolean truncateTable() {
      commitRows(new ArrayList<>(), true);
      return true;
    }
  }

  // ======================= read path =======================

  static class MemScanBuilder implements ScanBuilder, SupportsPushDownRequiredColumns {
    final MemTable table;
    StructType required;

    MemScanBuilder(MemTable table) {
      this.table = table;
      this.required = table.schema; // default: plain data columns
    }

    @Override
    public void pruneColumns(StructType requiredSchema) {
      // also how metadata columns are REQUESTED: the rewrite prunes to
      // data columns + _group, and the reader materializes that shape
      this.required = requiredSchema;
    }

    @Override
    public Scan build() {
      // snapshot AT PLAN TIME: a concurrent commit cannot tear the scan
      final List<InternalRow> snapshot = table.rows;
      final StructType tableSchema = table.schema;
      final StructType readSchema = required;
      return new Scan() {
        @Override
        public StructType readSchema() {
          return readSchema;
        }

        @Override
        public Batch toBatch() {
          return new Batch() {
            @Override
            public InputPartition[] planInputPartitions() {
              return new InputPartition[] {
                new RowsPartition(new ArrayList<>(snapshot), tableSchema, readSchema)
              };
            }

            @Override
            public PartitionReaderFactory createReaderFactory() {
              return new RowsReaderFactory();
            }
          };
        }
      };
    }
  }

  /** Rows ride inside the partition (UnsafeRow/GenericInternalRow are
   *  Serializable); local-mode tasks still serialize, so this must too. */
  static class RowsPartition implements InputPartition {
    final ArrayList<InternalRow> rows;
    final StructType tableSchema;
    final StructType readSchema;

    RowsPartition(ArrayList<InternalRow> rows, StructType tableSchema, StructType readSchema) {
      this.rows = rows;
      this.tableSchema = tableSchema;
      this.readSchema = readSchema;
    }
  }

  static class RowsReaderFactory implements PartitionReaderFactory {
    @Override
    public PartitionReader<InternalRow> createReader(InputPartition partition) {
      final RowsPartition p = (RowsPartition) partition;
      final List<InternalRow> rows = p.rows;
      // map each required field to its data ordinal (-1 = the _group
      // metadata column, materialized as a constant)
      final StructField[] fields = p.readSchema.fields();
      final int[] ordinals = new int[fields.length];
      final DataType[] types = new DataType[fields.length];
      for (int f = 0; f < fields.length; f++) {
        ordinals[f] =
            GROUP_COL.equals(fields[f].name())
                ? -1
                : p.tableSchema.fieldIndex(fields[f].name());
        types[f] = fields[f].dataType();
      }
      final UTF8String group = UTF8String.fromString("all");
      return new PartitionReader<InternalRow>() {
        int i = -1;

        @Override
        public boolean next() {
          return ++i < rows.size();
        }

        @Override
        public InternalRow get() {
          InternalRow stored = rows.get(i);
          Object[] vals = new Object[fields.length];
          for (int f = 0; f < fields.length; f++) {
            vals[f] = ordinals[f] < 0 ? group : stored.get(ordinals[f], types[f]);
          }
          return new GenericInternalRow(vals);
        }

        @Override
        public void close() {}
      };
    }
  }

  // ======================= write path =======================

  // implements SupportsTruncate so INSERT OVERWRITE / TRUNCATE TABLE,
  // which the declared TRUNCATE capability lets past analysis, actually
  // plan: truncate() maps to the replace=true commit (round-11 ADVICE
  // closure — previously the capability was declared but the builder
  // offered no truncation path, failing at write planning).
  static class MemWriteBuilder implements WriteBuilder, SupportsTruncate {
    final MemTable table;
    boolean replace;

    MemWriteBuilder(MemTable table, boolean replace) {
      this.table = table;
      this.replace = replace;
    }

    @Override
    public WriteBuilder truncate() {
      this.replace = true;
      return this;
    }

    @Override
    public Write build() {
      return new Write() {
        @Override
        public BatchWrite toBatch() {
          return new MemBatchWrite(table, replace);
        }
      };
    }
  }

  static class MemBatchWrite implements BatchWrite {
    final MemTable table;
    final boolean replace;

    MemBatchWrite(MemTable table, boolean replace) {
      this.table = table;
      this.replace = replace;
    }

    @Override
    public DataWriterFactory createBatchWriterFactory(PhysicalWriteInfo info) {
      return new MemWriterFactory();
    }

    @Override
    public void commit(WriterCommitMessage[] messages) {
      List<InternalRow> fresh = new ArrayList<>();
      for (WriterCommitMessage m : messages) {
        if (m != null) {
          fresh.addAll(((RowsCommitMessage) m).rows);
        }
      }
      table.commitRows(fresh, replace);
    }

    @Override
    public void abort(WriterCommitMessage[] messages) {
      // nothing durable was touched: the snapshot swap happens only in
      // commit — this IS the atomicity the double exists to model
    }
  }

  static class MemWriterFactory implements DataWriterFactory {
    @Override
    public DataWriter<InternalRow> createWriter(int partitionId, long taskId) {
      return new DataWriter<InternalRow>() {
        final ArrayList<InternalRow> buf = new ArrayList<>();

        @Override
        public void write(InternalRow row) {
          buf.add(row.copy()); // Spark reuses row objects: copy is mandatory
        }

        @Override
        public WriterCommitMessage commit() {
          return new RowsCommitMessage(buf);
        }

        @Override
        public void abort() {}

        @Override
        public void close() {}
      };
    }
  }

  static class RowsCommitMessage implements WriterCommitMessage, Serializable {
    final ArrayList<InternalRow> rows;

    RowsCommitMessage(ArrayList<InternalRow> rows) {
      this.rows = rows;
    }
  }
}
