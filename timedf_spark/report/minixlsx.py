"""Minimal dependency-free .xlsx writer (stdlib zipfile + hand-built OOXML).

Covers exactly what the analyst report (A11/L8 parity,
/root/reference/timedf/scripts/report_xlsx.py:23-100) needs and nothing
more: multiple worksheets, string/number cells, HIDDEN rows, and one
clustered horizontal bar chart per stage anchored next to the table.
xlsxwriter is not installable in this container — this writes the same
OOXML parts (ECMA-376, a public spec) directly:

    [Content_Types].xml            part declarations
    _rels/.rels                    package → workbook
    xl/workbook.xml(.rels)         sheet list → worksheet parts
    xl/styles.xml                  minimal required stylesheet
    xl/worksheets/sheetN.xml       sheetData (inline strings; hidden="1")
    xl/drawings/drawingN.xml       chart anchors per sheet
    xl/charts/chartN.xml           c:barChart with strRef/numRef formulas

Strings are written as inline strings (no sharedStrings table): simpler,
self-contained, and fine at report sizes.

Fresh implementation from the public ECMA-376 part names/shapes; no code
from any xlsx library.
"""

from __future__ import annotations

import zipfile
from dataclasses import dataclass, field
from xml.sax.saxutils import escape, quoteattr

__all__ = ["Workbook"]

_XMLDECL = '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
_NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_REL = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_NS_PKGREL = "http://schemas.openxmlformats.org/package/2006/relationships"
_NS_CT = "http://schemas.openxmlformats.org/package/2006/content-types"
_NS_C = "http://schemas.openxmlformats.org/drawingml/2006/chart"
_NS_A = "http://schemas.openxmlformats.org/drawingml/2006/main"
_NS_XDR = "http://schemas.openxmlformats.org/drawingml/2006/spreadsheetDrawing"


def col_letter(c: int) -> str:
    """0-based column index → A1-style letters."""
    out = ""
    c += 1
    while c:
        c, rem = divmod(c - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def cell_ref(r: int, c: int) -> str:
    return f"{col_letter(c)}{r + 1}"


def area_ref(sheet: str, r1: int, c1: int, r2: int, c2: int) -> str:
    """Absolute 'Sheet'!$A$1:$B$2 formula for chart data references."""
    return (
        f"'{sheet}'!${col_letter(c1)}${r1 + 1}:${col_letter(c2)}${r2 + 1}"
    )


@dataclass
class _Chart:
    title: str
    name_ref: str  # series name (strRef formula)
    cat_ref: str  # categories (strRef formula)
    val_ref: str  # values (numRef formula)
    anchor_row: int
    anchor_col: int
    rows_tall: int = 15
    cols_wide: int = 8


@dataclass
class _Sheet:
    name: str
    rows: dict[int, list[object]] = field(default_factory=dict)
    hidden: set[int] = field(default_factory=set)
    charts: list[_Chart] = field(default_factory=list)

    def write_row(self, r: int, values: list[object]) -> None:
        self.rows[r] = list(values)

    def hide_row(self, r: int) -> None:
        self.hidden.add(r)

    def add_bar_chart(
        self,
        title: str,
        name_ref: str,
        cat_ref: str,
        val_ref: str,
        anchor_row: int,
        anchor_col: int,
    ) -> None:
        self.charts.append(
            _Chart(title, name_ref, cat_ref, val_ref, anchor_row, anchor_col)
        )


class Workbook:
    def __init__(self) -> None:
        self._sheets: list[_Sheet] = []

    def add_sheet(self, name: str) -> _Sheet:
        # Excel's 31-char limit, and single quotes break chart formulas
        s = _Sheet(name[:31].replace("'", ""))
        self._sheets.append(s)
        return s

    # -- part renderers -----------------------------------------------------

    def _sheet_xml(self, s: _Sheet, drawing_rid: str | None) -> str:
        rows_xml = []
        for r in sorted(s.rows):
            cells = []
            for c, v in enumerate(s.rows[r]):
                if v is None:
                    continue
                ref = cell_ref(r, c)
                if isinstance(v, (int, float)) and not isinstance(v, bool):
                    cells.append(f'<c r="{ref}"><v>{v}</v></c>')
                else:
                    cells.append(
                        f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                        f"{escape(str(v))}</t></is></c>"
                    )
            hidden = ' hidden="1"' if r in s.hidden else ""
            rows_xml.append(f'<row r="{r + 1}"{hidden}>{"".join(cells)}</row>')
        drawing = f'<drawing r:id="{drawing_rid}"/>' if drawing_rid else ""
        return (
            _XMLDECL
            + f'<worksheet xmlns="{_NS_MAIN}" xmlns:r="{_NS_REL}">'
            + f"<sheetData>{''.join(rows_xml)}</sheetData>{drawing}</worksheet>"
        )

    def _chart_xml(self, ch: _Chart) -> str:
        return (
            _XMLDECL
            + f'<c:chartSpace xmlns:c="{_NS_C}" xmlns:a="{_NS_A}" xmlns:r="{_NS_REL}">'
            "<c:chart>"
            "<c:title><c:tx><c:rich><a:bodyPr/><a:lstStyle/><a:p><a:r>"
            f"<a:t>{escape(ch.title)}</a:t></a:r></a:p></c:rich></c:tx>"
            '<c:overlay val="0"/></c:title><c:autoTitleDeleted val="0"/>'
            "<c:plotArea><c:layout/>"
            '<c:barChart><c:barDir val="bar"/><c:grouping val="clustered"/>'
            '<c:varyColors val="0"/>'
            '<c:ser><c:idx val="0"/><c:order val="0"/>'
            f"<c:tx><c:strRef><c:f>{escape(ch.name_ref)}</c:f></c:strRef></c:tx>"
            f"<c:cat><c:strRef><c:f>{escape(ch.cat_ref)}</c:f></c:strRef></c:cat>"
            f"<c:val><c:numRef><c:f>{escape(ch.val_ref)}</c:f></c:numRef></c:val>"
            "</c:ser>"
            '<c:axId val="111111111"/><c:axId val="222222222"/></c:barChart>'
            '<c:catAx><c:axId val="111111111"/>'
            '<c:scaling><c:orientation val="minMax"/></c:scaling>'
            '<c:delete val="0"/><c:axPos val="l"/>'
            '<c:crossAx val="222222222"/></c:catAx>'
            '<c:valAx><c:axId val="222222222"/>'
            '<c:scaling><c:orientation val="minMax"/></c:scaling>'
            '<c:delete val="0"/><c:axPos val="b"/>'
            '<c:crossAx val="111111111"/></c:valAx>'
            '</c:plotArea><c:plotVisOnly val="1"/></c:chart></c:chartSpace>'
        )

    def _drawing_xml(self, s: _Sheet, chart_rids: list[str]) -> str:
        anchors = []
        for i, (ch, rid) in enumerate(zip(s.charts, chart_rids)):
            anchors.append(
                "<xdr:twoCellAnchor>"
                f"<xdr:from><xdr:col>{ch.anchor_col}</xdr:col><xdr:colOff>0</xdr:colOff>"
                f"<xdr:row>{ch.anchor_row}</xdr:row><xdr:rowOff>0</xdr:rowOff></xdr:from>"
                f"<xdr:to><xdr:col>{ch.anchor_col + ch.cols_wide}</xdr:col><xdr:colOff>0</xdr:colOff>"
                f"<xdr:row>{ch.anchor_row + ch.rows_tall}</xdr:row><xdr:rowOff>0</xdr:rowOff></xdr:to>"
                '<xdr:graphicFrame macro="">'
                "<xdr:nvGraphicFramePr>"
                f'<xdr:cNvPr id="{i + 2}" name="Chart {i + 1}"/>'
                "<xdr:cNvGraphicFramePr/></xdr:nvGraphicFramePr>"
                '<xdr:xfrm><a:off x="0" y="0"/><a:ext cx="0" cy="0"/></xdr:xfrm>'
                "<a:graphic>"
                f'<a:graphicData uri="{_NS_C}">'
                f'<c:chart xmlns:c="{_NS_C}" xmlns:r="{_NS_REL}" r:id="{rid}"/>'
                "</a:graphicData></a:graphic></xdr:graphicFrame>"
                "<xdr:clientData/></xdr:twoCellAnchor>"
            )
        return (
            _XMLDECL
            + f'<xdr:wsDr xmlns:xdr="{_NS_XDR}" xmlns:a="{_NS_A}">'
            + "".join(anchors)
            + "</xdr:wsDr>"
        )

    def save(self, path: str) -> None:
        n_sheets = len(self._sheets)
        chart_parts: list[tuple[str, str]] = []  # (partname, xml)
        drawing_parts: list[tuple[str, str]] = []
        sheet_rels: list[tuple[str, str]] = []  # per-sheet rels xml
        sheet_xmls: list[str] = []
        chart_no = 0
        for i, s in enumerate(self._sheets, start=1):
            drawing_rid = None
            rels = []
            if s.charts:
                drawing_no = len(drawing_parts) + 1
                rids = []
                chart_rels = []
                for ch in s.charts:
                    chart_no += 1
                    rid = f"rId{len(chart_rels) + 1}"
                    rids.append(rid)
                    chart_rels.append(
                        f'<Relationship Id="{rid}" Type="{_NS_REL}/chart" '
                        f'Target="../charts/chart{chart_no}.xml"/>'
                    )
                    chart_parts.append((f"xl/charts/chart{chart_no}.xml", self._chart_xml(ch)))
                drawing_parts.append(
                    (f"xl/drawings/drawing{drawing_no}.xml", self._drawing_xml(s, rids))
                )
                drawing_parts.append(
                    (
                        f"xl/drawings/_rels/drawing{drawing_no}.xml.rels",
                        _XMLDECL
                        + f'<Relationships xmlns="{_NS_PKGREL}">'
                        + "".join(chart_rels)
                        + "</Relationships>",
                    )
                )
                drawing_rid = "rId1"
                rels.append(
                    f'<Relationship Id="rId1" Type="{_NS_REL}/drawing" '
                    f'Target="../drawings/drawing{drawing_no}.xml"/>'
                )
            sheet_rels.append(
                (
                    f"xl/worksheets/_rels/sheet{i}.xml.rels",
                    _XMLDECL
                    + f'<Relationships xmlns="{_NS_PKGREL}">'
                    + "".join(rels)
                    + "</Relationships>",
                )
                if rels
                else ("", "")
            )
            sheet_xmls.append(self._sheet_xml(s, drawing_rid))

        workbook = (
            _XMLDECL
            + f'<workbook xmlns="{_NS_MAIN}" xmlns:r="{_NS_REL}"><sheets>'
            + "".join(
                # quoteattr: attribute context needs &quot; escaping too
                f'<sheet name={quoteattr(s.name)} sheetId="{i}" r:id="rIdS{i}"/>'
                for i, s in enumerate(self._sheets, start=1)
            )
            + "</sheets></workbook>"
        )
        wb_rels = (
            _XMLDECL
            + f'<Relationships xmlns="{_NS_PKGREL}">'
            + "".join(
                f'<Relationship Id="rIdS{i}" Type="{_NS_REL}/worksheet" '
                f'Target="worksheets/sheet{i}.xml"/>'
                for i in range(1, n_sheets + 1)
            )
            + f'<Relationship Id="rIdStyles" Type="{_NS_REL}/styles" Target="styles.xml"/>'
            + "</Relationships>"
        )
        styles = (
            _XMLDECL
            + f'<styleSheet xmlns="{_NS_MAIN}">'
            '<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>'
            '<fills count="1"><fill><patternFill patternType="none"/></fill></fills>'
            '<borders count="1"><border/></borders>'
            '<cellStyleXfs count="1"><xf/></cellStyleXfs>'
            '<cellXfs count="1"><xf/></cellXfs></styleSheet>'
        )
        overrides = [
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
            'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>',
            '<Override PartName="/xl/styles.xml" ContentType="application/vnd.'
            'openxmlformats-officedocument.spreadsheetml.styles+xml"/>',
        ]
        for i in range(1, n_sheets + 1):
            overrides.append(
                f'<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType='
                '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            )
        for name, _ in chart_parts:
            overrides.append(
                f'<Override PartName="/{name}" ContentType='
                '"application/vnd.openxmlformats-officedocument.drawingml.chart+xml"/>'
            )
        for name, _ in drawing_parts:
            if name.endswith(".rels"):
                continue
            overrides.append(
                f'<Override PartName="/{name}" ContentType='
                '"application/vnd.openxmlformats-officedocument.drawing+xml"/>'
            )
        content_types = (
            _XMLDECL
            + f'<Types xmlns="{_NS_CT}">'
            '<Default Extension="rels" ContentType='
            '"application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            + "".join(overrides)
            + "</Types>"
        )
        root_rels = (
            _XMLDECL
            + f'<Relationships xmlns="{_NS_PKGREL}">'
            f'<Relationship Id="rId1" Type="{_NS_REL}/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>"
        )

        with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
            z.writestr("[Content_Types].xml", content_types)
            z.writestr("_rels/.rels", root_rels)
            z.writestr("xl/workbook.xml", workbook)
            z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
            z.writestr("xl/styles.xml", styles)
            for i, xml in enumerate(sheet_xmls, start=1):
                z.writestr(f"xl/worksheets/sheet{i}.xml", xml)
            for name, xml in sheet_rels:
                if name:
                    z.writestr(name, xml)
            for name, xml in drawing_parts:
                z.writestr(name, xml)
            for name, xml in chart_parts:
                z.writestr(name, xml)
