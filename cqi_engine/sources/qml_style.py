"""S5 — QML graduated style sink (ref:styles/index.qml).

The reference ships a QGIS graduated-color renderer keyed on ``index``:
11 equal-interval classes (0-10 ... 90-100 plus a ``100 - 100`` class that
QGIS's first-match range scan can never reach, because 90 < 100 <= 100
matches the previous range first — reproduced faithfully).  This module
makes that styling a first-class engine output:

* :data:`INDEX_STYLE_RANGES` — the renderer's class table (lower, upper,
  symbol, label, rgba), values lifted verbatim from the reference QML
  (behavioral contract data, like the parameter.py rule tables);
* :func:`style_expr_sql` — the classification as a dual-dialect CASE
  chain (pure Catalyst expression — no UDF, no join);
* :func:`style_layer` — DataFrame -> DataFrame with ``style_symbol`` /
  ``style_label`` / ``style_color`` columns;
* :func:`write_qml` — emit a loadable QML file so the engine's GeoJSON /
  tile exports render with the reference's exact color ramp in QGIS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (lower, upper, symbol, label, (r, g, b, a)) — ref:styles/index.qml
# <range> rows 17-27 + per-symbol line_color Options.
INDEX_STYLE_RANGES: list[tuple[float, float, int, str,
                               tuple[int, int, int, int]]] = [
    (0.0, 10.0, 0, "0 - 10", (122, 4, 3, 255)),
    (10.0, 20.0, 1, "10 - 20", (171, 27, 4, 255)),
    (20.0, 30.0, 2, "20 - 30", (213, 74, 18, 255)),
    (30.0, 40.0, 3, "30 - 40", (245, 160, 56, 255)),
    (40.0, 50.0, 4, "40 - 50", (243, 207, 51, 255)),
    (50.0, 60.0, 5, "50 - 60", (230, 241, 34, 255)),
    (60.0, 70.0, 6, "60 - 70", (167, 200, 120, 255)),
    (70.0, 80.0, 7, "70 - 80", (103, 159, 206, 255)),
    (80.0, 90.0, 8, "80 - 90", (68, 115, 225, 255)),
    (90.0, 100.0, 9, "90 - 100", (67, 109, 218, 255)),
    (100.0, 100.0, 10, "100 - 100", (65, 67, 167, 255)),
]


def hex_color(rgba: tuple[int, int, int, int]) -> str:
    r, g, b, _a = rgba
    return f"#{r:02x}{g:02x}{b:02x}"


def _first_match_bounds() -> list[tuple[float, float, int]]:
    """QGIS first-match semantics: the first range with lower <= v <= upper
    wins (ranges are ordered), so every class after the first is
    effectively (lower, upper]."""
    return [(lo, up, sym) for lo, up, sym, _l, _c in INDEX_STYLE_RANGES]


def style_expr_sql(index_col: str = "index") -> str:
    """Symbol classification as SQL (identical Spark / DuckDB syntax)."""
    parts = []
    for i, (lo, up, sym) in enumerate(_first_match_bounds()):
        lo_cmp = f"{index_col} >= {lo}" if i == 0 else f"{index_col} > {lo}"
        parts.append(f"when {lo_cmp} and {index_col} <= {up} then {sym}")
    return "case " + " ".join(parts) + " else null end"


def style_layer(df: DataFrame, index_col: str = "index") -> DataFrame:
    """Attach style_symbol / style_label / style_color columns.

    Pure CASE-WHEN expressions: stays inside whole-stage codegen at any
    scale (no UDF, no lookup join for an 11-row table).
    """
    sym = F.expr(style_expr_sql(index_col))
    label = F.element_at(
        F.array(*[F.lit(lbl) for _lo, _up, _s, lbl, _c in
                  INDEX_STYLE_RANGES]), sym + 1)
    color = F.element_at(
        F.array(*[F.lit(hex_color(c)) for *_x, c in INDEX_STYLE_RANGES]),
        sym + 1)
    return (df.withColumn("style_symbol", sym.cast("int"))
            .withColumn("style_label", label)
            .withColumn("style_color", color))


_QML_TEMPLATE = """<!DOCTYPE qgis PUBLIC 'http://mrcc.com/qgis.dtd' 'SYSTEM'>
<qgis styleCategories="Symbology" version="3.28">
  <renderer-v2 type="graduatedSymbol" attr="{attr}" graduatedMethod="GraduatedColor">
    <ranges>
{ranges}
    </ranges>
    <symbols>
{symbols}
    </symbols>
  </renderer-v2>
</qgis>
"""


def write_qml(path: str, attr: str = "index") -> None:
    """Emit a loadable QGIS style file with the reference color ramp."""
    ranges = "\n".join(
        f'      <range lower="{lo}" upper="{up}" symbol="{sym}" '
        f'render="true" label="{lbl}"/>'
        for lo, up, sym, lbl, _c in INDEX_STYLE_RANGES)
    symbols = "\n".join(
        f'      <symbol name="{sym}" type="line" alpha="1">\n'
        f'        <layer class="SimpleLine">\n'
        f'          <prop k="line_color" v="{r},{g},{b},{a}"/>\n'
        f'          <prop k="line_width" v="0.6"/>\n'
        f'        </layer>\n'
        f'      </symbol>'
        for _lo, _up, sym, _lbl, (r, g, b, a) in INDEX_STYLE_RANGES)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(_QML_TEMPLATE.format(attr=attr, ranges=ranges,
                                      symbols=symbols))
