"""Analyst report from the results warehouse (A11/L8 parity).

Mirrors the reference's report generator
(timedf/scripts/report_xlsx.py:23-176) structure-for-structure:

- one sheet/section per benchmark; columns = backends;
- run-configuration rows written but HIDDEN (constant-across-backends
  params are recognized and collapsed, report_xlsx.py:17-20);
- one horizontal bar chart per query/stage (report_xlsx.py:41-63);
- a HostInfo sheet/section (report_xlsx.py:94-100).

Engine: ``xlsxwriter`` when importable (the library the reference uses);
otherwise the in-repo dependency-free OOXML writer
(``report/minixlsx.py``) renders the SAME sheets/hidden rows/bar charts
as a real .xlsx — so the xlsx deliverable exists in this container too.
An ``.html`` output path renders the HTML twin of the same structure
(<details>-collapsed config rows, CSS bars).

Fresh implementation — no code shared with the reference (it drives
pandas.io.formats.excel; this walks the sqlite warehouse directly).
"""

from __future__ import annotations

import html
import json
from typing import Any

from timedf_spark.report.db import BenchmarkDb

__all__ = [
    "collect_report_data",
    "write_html_report",
    "write_xlsx_report",
    "write_xlsx_report_builtin",
    "build_report",
]


def collect_report_data(db: BenchmarkDb, agg: str = "median") -> dict[str, Any]:
    """Warehouse → report model.

    For every benchmark: per-backend aggregated stage durations (latest
    run per (benchmark, backend), ``agg`` over its iterations — the
    reference's groupby(["benchmark","backend"]).last() then agg,
    report_xlsx.py:150 + benchmark_db.py:228-232), the run params, and
    which param rows are constant across backends (the hidden-row set).
    """
    import statistics

    fn = {
        "median": statistics.median,
        "mean": statistics.fmean,
        "min": min,
        "max": max,
    }[agg]

    rows = list(
        db.con.execute(
            "SELECT i.benchmark, i.backend, i.run_id, i.id, i.params, i.host_params"
            " FROM iteration i ORDER BY i.id"
        )
    )
    # latest run per (benchmark, backend): later rows overwrite earlier
    latest: dict[tuple[str, str], tuple[str, dict, dict]] = {}
    for bench, backend, run_id, _iid, params, host in rows:
        latest[(bench, backend)] = (run_id, json.loads(params or "{}"), json.loads(host or "{}"))

    benches: dict[str, dict[str, Any]] = {}
    host_info: dict[str, Any] = {}
    for (bench, backend), (run_id, params, host) in latest.items():
        durs: dict[str, list[float]] = {}
        for b, bk, _it, name, dur in db.load_measurements(run_id):
            if b == bench and bk == backend:
                durs.setdefault(name, []).append(dur)
        entry = benches.setdefault(bench, {"backends": {}, "stages": [], "params": {}})
        entry["backends"][backend] = {name: fn(v) for name, v in durs.items()}
        entry["params"][backend] = params
        for name in durs:
            if name not in entry["stages"]:
                entry["stages"].append(name)
        host_info.update(host)

    for entry in benches.values():
        # hidden-config detection: params constant across every backend
        # column (reference: nunique()==1, report_xlsx.py:17-20)
        keys = {k for p in entry["params"].values() for k in p}
        constant = []
        varying = []
        for k in sorted(keys):
            vals = {json.dumps(p.get(k), sort_keys=True, default=str) for p in entry["params"].values()}
            (constant if len(vals) == 1 else varying).append(k)
        entry["hidden_param_rows"] = constant
        entry["visible_param_rows"] = varying
    return {"benchmarks": benches, "host_info": host_info, "agg": agg}


def write_xlsx_report(data: dict[str, Any], out_path: str) -> None:
    """xlsxwriter rendering — sheet per benchmark, hidden config rows, bar
    chart per stage, HostInfo sheet (report_xlsx.py:23-100 shapes)."""
    import xlsxwriter  # gated: not in this container; tested where present

    book = xlsxwriter.Workbook(out_path)
    bold = book.add_format({"bold": True, "align": "left"})
    for bench, entry in data["benchmarks"].items():
        sheet = book.add_worksheet(bench[:31])
        backends = sorted(entry["backends"])
        sheet.set_column(0, 0, 24, bold)
        sheet.set_column(1, len(backends), 20)
        sheet.write_row(0, 0, ["backend", *backends], bold)
        r = 1
        param_rows = entry["hidden_param_rows"] + entry["visible_param_rows"]
        for k in param_rows:
            sheet.write_row(
                r, 0, [k, *[str(entry["params"][b].get(k, "None")) for b in backends]]
            )
            if k in entry["hidden_param_rows"]:
                sheet.set_row(r, None, None, {"hidden": True})
            r += 1
        chart_row = r
        for i, stage in enumerate(entry["stages"]):
            sheet.write_row(
                r, 0, [stage, *[entry["backends"][b].get(stage) for b in backends]]
            )
            chart = book.add_chart({"type": "bar"})
            chart.add_series(
                {
                    "name": [bench[:31], r, 0],
                    "categories": [bench[:31], 0, 1, 0, len(backends)],
                    "values": [bench[:31], r, 1, r, len(backends)],
                }
            )
            chart.set_title({"name": f"Query: {stage}"})
            chart.set_x_axis({"name": "Time, s"})
            chart.set_y_axis({"name": "Task"})
            sheet.insert_chart(chart_row + i * 20, len(backends) + 1, chart)
            r += 1
    sheet = book.add_worksheet("HostInfo")
    sheet.set_column(0, 0, 24, bold)
    for r, (k, v) in enumerate(sorted(data["host_info"].items())):
        sheet.write_row(r, 0, [k, str(v)])
    book.close()


def write_xlsx_report_builtin(data: dict[str, Any], out_path: str) -> None:
    """Same sheet/hidden-row/chart layout rendered with the in-repo
    dependency-free OOXML writer (report/minixlsx.py) — the in-container
    default, closing the A11 gap without xlsxwriter."""
    from timedf_spark.report import minixlsx

    book = minixlsx.Workbook()
    for bench, entry in data["benchmarks"].items():
        sheet = book.add_sheet(bench)
        backends = sorted(entry["backends"])
        sheet.write_row(0, ["backend", *backends])
        r = 1
        for k in entry["hidden_param_rows"] + entry["visible_param_rows"]:
            sheet.write_row(
                r, [k, *[str(entry["params"][b].get(k, "None")) for b in backends]]
            )
            if k in entry["hidden_param_rows"]:
                sheet.hide_row(r)
            r += 1
        chart_row = r
        for i, stage in enumerate(entry["stages"]):
            sheet.write_row(
                r, [stage, *[entry["backends"][b].get(stage) for b in backends]]
            )
            sheet.add_bar_chart(
                title=f"Query: {stage}",
                name_ref=minixlsx.area_ref(sheet.name, r, 0, r, 0),
                cat_ref=minixlsx.area_ref(sheet.name, 0, 1, 0, len(backends)),
                val_ref=minixlsx.area_ref(sheet.name, r, 1, r, len(backends)),
                anchor_row=chart_row + i * 16,
                anchor_col=len(backends) + 2,
            )
            r += 1
    host = book.add_sheet("HostInfo")
    for r, (k, v) in enumerate(sorted(data["host_info"].items())):
        host.write_row(r, [k, str(v)])
    book.save(out_path)


_CSS = """
body { font-family: sans-serif; margin: 2em; }
table { border-collapse: collapse; margin: 0.5em 0; }
td, th { border: 1px solid #ccc; padding: 2px 10px; text-align: left; }
.bar { background: #4472c4; height: 14px; display: inline-block; }
.barlabel { font-size: 12px; margin-left: 4px; }
details { margin: 0.5em 0; }
"""


def write_html_report(data: dict[str, Any], out_path: str) -> None:
    """HTML rendering with the same logical structure as the xlsx sheets
    (the in-container default: xlsxwriter is unavailable here)."""
    parts = [f"<html><head><style>{_CSS}</style></head><body>"]
    parts.append(f"<h1>benchmark report (agg={html.escape(data['agg'])})</h1>")
    for bench, entry in data["benchmarks"].items():
        backends = sorted(entry["backends"])
        parts.append(f"<h2>{html.escape(bench)}</h2>")
        # hidden config rows ≙ collapsed details block
        parts.append("<details><summary>run configuration (constant rows hidden)</summary><table>")
        for k in entry["hidden_param_rows"] + entry["visible_param_rows"]:
            cells = "".join(
                f"<td>{html.escape(str(entry['params'][b].get(k, 'None')))}</td>" for b in backends
            )
            parts.append(f"<tr><th>{html.escape(k)}</th>{cells}</tr>")
        parts.append("</table></details>")
        parts.append("<table><tr><th>stage</th>" + "".join(f"<th>{html.escape(b)}</th>" for b in backends) + "</tr>")
        max_d = max(
            (d for b in backends for d in entry["backends"][b].values()), default=1.0
        ) or 1.0
        for stage in entry["stages"]:
            cells = []
            for b in backends:
                d = entry["backends"][b].get(stage)
                if d is None:
                    cells.append("<td>—</td>")
                else:
                    w = max(1, int(240 * d / max_d))
                    cells.append(
                        f'<td><span class="bar" style="width:{w}px"></span>'
                        f'<span class="barlabel">{d:.3f}s</span></td>'
                    )
            parts.append(f"<tr><th>{html.escape(stage)}</th>{''.join(cells)}</tr>")
        parts.append("</table>")
    parts.append("<h2>HostInfo</h2><table>")
    for k, v in sorted(data["host_info"].items()):
        parts.append(f"<tr><th>{html.escape(str(k))}</th><td>{html.escape(str(v))}</td></tr>")
    parts.append("</table></body></html>")
    with open(out_path, "w") as f:
        f.write("\n".join(parts))


def build_report(db: BenchmarkDb, out_path: str, agg: str = "median") -> str:
    """Render the report. An .xlsx suffix always produces real xlsx:
    xlsxwriter when importable, else the in-repo OOXML writer. An .html
    suffix renders the HTML twin. Returns the path written."""
    data = collect_report_data(db, agg=agg)
    if out_path.endswith(".xlsx"):
        try:
            write_xlsx_report(data, out_path)
        except ImportError:
            write_xlsx_report_builtin(data, out_path)
        return out_path
    write_html_report(data, out_path)
    return out_path


def main(argv: list[str] | None = None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        prog="report-xlsx", description="render analyst report from results DB"
    )
    p.add_argument("-db_file", required=True)
    p.add_argument("-report_path", default="report.xlsx")
    p.add_argument("-agg", default="median", choices=["median", "mean", "min", "max"])
    args = p.parse_args(argv)
    db = BenchmarkDb(args.db_file)
    path = build_report(db, args.report_path, agg=args.agg)
    print(path)
    db.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
