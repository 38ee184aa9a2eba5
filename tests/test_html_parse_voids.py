"""Parser regression: real-world HTML writes void elements WITHOUT the
XHTML self-closing slash (`<img src=...>`, `<br>`); the depth tracker must
not skew on them or tracked divs never close and later tables vanish."""

from cdmx_airquality_etl_spark.sources.html_parse import parse_page

PAGE = """
<html><body>
  <div id="textohora">14 h <img src="clock.png"> martes 3 de junio de 2025</div>
  <div id="t1">
    <table>
      <tr><td>A<br>B</td><td><img src="x/buena.svg"></td></tr>
    </table>
  </div>
  <div id="t2">
    <table>
      <tr><td>C</td><td><img src="x/mala.svg"></td></tr>
    </table>
  </div>
</body></html>
"""


def test_unclosed_void_tags_do_not_skew_depth():
    page = parse_page(PAGE, ["textohora"], ["t1", "t2"])
    assert page.div_texts["textohora"] == "14 h martes 3 de junio de 2025"
    assert set(page.tables) == {"t1", "t2"}  # second table not swallowed
    # bs4 get_text-equivalence: <br> contributes no separator; the img-only
    # cell yields an empty string
    assert page.tables["t1"][0].cells == ["AB", ""]
    assert page.tables["t1"][0].img_src == "x/buena.svg"
    assert page.tables["t2"][0].img_src == "x/mala.svg"


def test_xhtml_self_closed_voids_still_work():
    xhtml = PAGE.replace('<img src="clock.png">', '<img src="clock.png"/>').replace(
        '<img src="x/buena.svg">', '<img src="x/buena.svg"/>'
    ).replace("<br>", "<br/>")
    page = parse_page(xhtml, ["textohora"], ["t1", "t2"])
    assert page.div_texts["textohora"] == "14 h martes 3 de junio de 2025"
    assert set(page.tables) == {"t1", "t2"}
