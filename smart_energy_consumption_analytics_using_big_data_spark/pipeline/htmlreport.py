"""Self-contained static HTML rendering of the dashboard report.

The reference serves its dashboard from Streamlit + Plotly
(`visualization/streamlit_app.py:713-1107` page layout, `:236-255` KPI
cards, `:481-555` anomaly overview, `:605-694` consumption profiles +
cluster analysis, `:406` residual Q-Q); this module renders the same
panels from the engine-side report dict (pipeline/report.build_report)
as ONE dependency-free HTML file — inline SVG marks, no JS libraries,
no server, no network. `cli.py report --html out.html` is the user
entry point.

Chart discipline (single source of truth for the visual constants):
- categorical slots 1-2 only (blue #2a78d6 / orange #eb6834, dark
  variants #3987e5 / #d95926) — validated for both surfaces (CVD dE
  24.7+ light / 26.8+ dark, contrast >= 3:1); every panel here is a
  single series, so no legend box except the two-encoding Q-Q panel;
- bars <= 24px thick, 4px rounded data-end, square at the baseline;
  lines 2px round-capped; markers r>=4 with a 2px surface ring;
- hairline solid gridlines one step off the surface; axis/label text
  always wears text tokens, never the series color;
- native hover via SVG <title> on every mark, and a <details> data
  table under every chart (the no-color fallback channel);
- dark mode is selected (its own hex steps under
  prefers-color-scheme), not an automatic inversion.

Everything is driver-side string building over KPI-sized inputs (the
report dict is scalars + top-15 lists by construction), so this module
does zero Spark work.
"""

from __future__ import annotations

import html as _html
import math

_WEEKDAYS = {1: "Sun", 2: "Mon", 3: "Tue", 4: "Wed", 5: "Thu", 6: "Fri", 7: "Sat"}

_CSS = """
.enrg-root {
  color-scheme: light;
  --surface-1: #fcfcfb; --surface-2: #f0efec;
  --text-primary: #0b0b0b; --text-secondary: #52514e;
  --grid: #e4e3df; --series-1: #2a78d6; --series-2: #eb6834;
  font-family: system-ui, -apple-system, "Segoe UI", sans-serif;
  background: var(--surface-1); color: var(--text-primary);
  margin: 0 auto; max-width: 1080px; padding: 24px;
}
@media (prefers-color-scheme: dark) {
  :root:where(:not([data-theme="light"])) .enrg-root {
    color-scheme: dark;
    --surface-1: #1a1a19; --surface-2: #383835;
    --text-primary: #ffffff; --text-secondary: #c3c2b7;
    --grid: #333330; --series-1: #3987e5; --series-2: #d95926;
  }
}
.enrg-root h1 { font-size: 22px; margin: 0 0 4px; }
.enrg-root h2 { font-size: 15px; margin: 28px 0 10px; }
.enrg-root .sub { color: var(--text-secondary); font-size: 13px; margin-bottom: 20px; }
.enrg-root .tiles { display: flex; flex-wrap: wrap; gap: 12px; }
.enrg-root .tile {
  background: var(--surface-2); border-radius: 8px; padding: 12px 16px;
  min-width: 130px;
}
.enrg-root .tile .lbl { color: var(--text-secondary); font-size: 12px; }
.enrg-root .tile .val { font-size: 24px; font-weight: 600; margin-top: 2px; }
.enrg-root .grid2 { display: grid; grid-template-columns: 1fr 1fr; gap: 24px; }
@media (max-width: 800px) { .enrg-root .grid2 { grid-template-columns: 1fr; } }
.enrg-root svg text { fill: var(--text-secondary); font-size: 11px; }
.enrg-root svg .axis { stroke: var(--grid); stroke-width: 1; }
.enrg-root svg .mark { fill: var(--series-1); }
.enrg-root svg .mark:hover { opacity: 0.8; }
.enrg-root details { margin: 6px 0 0; font-size: 12px; }
.enrg-root summary { color: var(--text-secondary); cursor: pointer; }
.enrg-root table { border-collapse: collapse; margin-top: 6px; font-variant-numeric: tabular-nums; }
.enrg-root th, .enrg-root td {
  border-bottom: 1px solid var(--grid); padding: 3px 10px 3px 0; text-align: right;
}
.enrg-root th:first-child, .enrg-root td:first-child { text-align: left; }
.enrg-root .legend { font-size: 12px; color: var(--text-secondary); margin: 2px 0 6px; }
.enrg-root .legend .sw {
  display: inline-block; width: 10px; height: 10px; border-radius: 2px;
  vertical-align: -1px; margin: 0 4px 0 10px;
}
"""


def _esc(v) -> str:
    return _html.escape(str(v))


def _fmt(v) -> str:
    """Compact display numbers: 1,284 / 12.9K / 4.2M."""
    if v is None:
        return "–"
    if isinstance(v, float) and not v.is_integer():
        if abs(v) >= 10_000:
            return _fmt(round(v))
        return f"{v:,.4g}" if abs(v) < 100 else f"{v:,.1f}"
    n = float(v)
    if abs(n) >= 1_000_000:
        return f"{n / 1_000_000:.1f}M"
    if abs(n) >= 10_000:
        return f"{n / 1_000:.1f}K"
    return f"{int(n):,}"


def _nice_ticks(vmax: float, n: int = 4) -> list[float]:
    """Clean round tick values covering [0, vmax]."""
    if vmax <= 0:
        return [0.0, 1.0]
    raw = vmax / n
    mag = 10 ** math.floor(math.log10(raw))
    step = next(s * mag for s in (1, 2, 2.5, 5, 10) if s * mag >= raw)
    return [i * step for i in range(int(math.ceil(vmax / step)) + 1)]


def _tick_label(t: float) -> str:
    return f"{t:g}" if abs(t) < 10_000 else _fmt(t)


def _table(rows: list[dict], summary: str = "Data table") -> str:
    if not rows:
        return ""
    cols = list(rows[0])
    head = "".join(f"<th>{_esc(c)}</th>" for c in cols)
    body = "".join(
        "<tr>" + "".join(f"<td>{_esc('–' if r[c] is None else r[c])}</td>" for c in cols) + "</tr>"
        for r in rows
    )
    return (
        f"<details><summary>{_esc(summary)}</summary>"
        f"<table><tr>{head}</tr>{body}</table></details>"
    )


def _rounded_top_bar(x: float, y: float, w: float, h: float, r: float = 4) -> str:
    """Bar path: 4px rounded data-end, square at the baseline."""
    r = min(r, w / 2, h)
    y0 = y + h
    return (
        f"M{x:.1f},{y0:.1f} L{x:.1f},{y + r:.1f} Q{x:.1f},{y:.1f} {x + r:.1f},{y:.1f} "
        f"L{x + w - r:.1f},{y:.1f} Q{x + w:.1f},{y:.1f} {x + w:.1f},{y + r:.1f} "
        f"L{x + w:.1f},{y0:.1f} Z"
    )


def _rounded_end_hbar(x: float, y: float, w: float, h: float, r: float = 4) -> str:
    """Horizontal bar: rounded right data-end, square at the left baseline."""
    r = min(r, h / 2, w)
    return (
        f"M{x:.1f},{y:.1f} L{x + w - r:.1f},{y:.1f} Q{x + w:.1f},{y:.1f} {x + w:.1f},{y + r:.1f} "
        f"L{x + w:.1f},{y + h - r:.1f} Q{x + w:.1f},{y + h:.1f} {x + w - r:.1f},{y + h:.1f} "
        f"L{x:.1f},{y + h:.1f} Z"
    )


_W, _H = 480, 240
_ML, _MR, _MT, _MB = 46, 10, 10, 28


def _frame(ticks: list[float], vmax: float) -> tuple[str, float, float]:
    """Gridlines + y tick labels; returns (svg, plot_w, plot_h)."""
    pw, ph = _W - _ML - _MR, _H - _MT - _MB
    out = []
    for t in ticks:
        y = _MT + ph - (t / vmax) * ph
        out.append(f'<line class="axis" x1="{_ML}" y1="{y:.1f}" x2="{_W - _MR}" y2="{y:.1f}"/>')
        out.append(f'<text x="{_ML - 6}" y="{y + 4:.1f}" text-anchor="end">{_tick_label(t)}</text>')
    return "".join(out), pw, ph


def _bar_svg(items: list[tuple[str, float]], value_name: str) -> str:
    """Vertical single-series bars; <=24px thick with >=2px air between."""
    if not items:
        return "<p class='sub'>no data</p>"
    vmax_d = max(v for _, v in items)
    ticks = _nice_ticks(vmax_d)
    vmax = ticks[-1]
    frame, pw, ph = _frame(ticks, vmax)
    band = pw / len(items)
    bw = min(24.0, max(3.0, band - max(2.0, band * 0.25)))
    marks, labels = [], []
    for i, (lbl, v) in enumerate(items):
        x = _ML + i * band + (band - bw) / 2
        h = (v / vmax) * ph
        marks.append(
            f'<path class="mark" d="{_rounded_top_bar(x, _MT + ph - h, bw, h)}">'
            f"<title>{_esc(lbl)}: {_esc(v)}</title></path>"
        )
        if len(items) <= 16:
            labels.append(
                f'<text x="{x + bw / 2:.1f}" y="{_H - _MB + 16}" text-anchor="middle">{_esc(lbl)}</text>'
            )
        elif i in (0, len(items) - 1):
            anchor = "start" if i == 0 else "end"
            labels.append(
                f'<text x="{x + bw / 2:.1f}" y="{_H - _MB + 16}" text-anchor="{anchor}">{_esc(lbl)}</text>'
            )
    return (
        f'<svg viewBox="0 0 {_W} {_H}" role="img" aria-label="{_esc(value_name)}">'
        f"{frame}{''.join(marks)}{''.join(labels)}</svg>"
    )


def _hbar_svg(items: list[tuple[str, float]], value_name: str, height_per: int = 22) -> str:
    """Horizontal single-series bars with the value labeled at the tip."""
    if not items:
        return "<p class='sub'>no data</p>"
    h = len(items) * height_per + 16
    ml = 120
    pw = _W - ml - 60
    vmax = max(v for _, v in items) or 1.0
    rows = []
    for i, (lbl, v) in enumerate(items):
        y = 8 + i * height_per
        bw = (v / vmax) * pw
        bh = min(16.0, height_per - 4.0)
        rows.append(
            f'<text x="{ml - 8}" y="{y + bh - 3:.1f}" text-anchor="end">{_esc(lbl)}</text>'
            f'<path class="mark" d="{_rounded_end_hbar(ml, y, max(bw, 2), bh)}">'
            f"<title>{_esc(lbl)}: {_esc(v)}</title></path>"
            f'<text x="{ml + max(bw, 2) + 6:.1f}" y="{y + bh - 3:.1f}">{_esc(v)}</text>'
        )
    return (
        f'<svg viewBox="0 0 {_W} {h}" role="img" aria-label="{_esc(value_name)}">'
        f'<line class="axis" x1="{ml}" y1="4" x2="{ml}" y2="{h - 4}"/>{"".join(rows)}</svg>'
    )


def _line_svg(items: list[tuple[str, float]], value_name: str) -> str:
    """2px round-capped line, r=4 end marker with a 2px surface ring,
    endpoint direct-labeled; per-point hover targets."""
    if not items:
        return "<p class='sub'>no data</p>"
    vmax_d = max(v for _, v in items)
    ticks = _nice_ticks(vmax_d)
    vmax = ticks[-1]
    frame, pw, ph = _frame(ticks, vmax)
    n = len(items)
    xs = [_ML + (pw if n == 1 else i * pw / (n - 1)) for i in range(n)]
    ys = [_MT + ph - (v / vmax) * ph for _, v in items]
    pts = " ".join(f"{x:.1f},{y:.1f}" for x, y in zip(xs, ys))
    hover = "".join(
        f'<circle cx="{x:.1f}" cy="{y:.1f}" r="9" fill="transparent">'
        f"<title>{_esc(lbl)}: {_esc(v)}</title></circle>"
        for x, y, (lbl, v) in zip(xs, ys, items)
    )
    # sparse x labels: first / last (middle too when room allows)
    lbl_idx = {0, n - 1} | ({n // 2} if n > 4 else set())
    xlabels = "".join(
        f'<text x="{xs[i]:.1f}" y="{_H - _MB + 16}" '
        f'text-anchor="{"start" if i == 0 else "end" if i == n - 1 else "middle"}">'
        f"{_esc(items[i][0])}</text>"
        for i in sorted(lbl_idx)
    )
    end_label = (
        f'<text x="{xs[-1] - 8:.1f}" y="{ys[-1] - 8:.1f}" text-anchor="end">'
        f"{_esc(items[-1][1])}</text>"
    )
    return (
        f'<svg viewBox="0 0 {_W} {_H}" role="img" aria-label="{_esc(value_name)}">'
        f"{frame}"
        f'<polyline points="{pts}" fill="none" stroke="var(--series-1)" '
        f'stroke-width="2" stroke-linecap="round" stroke-linejoin="round"/>'
        f'<circle cx="{xs[-1]:.1f}" cy="{ys[-1]:.1f}" r="4" fill="var(--series-1)" '
        f'stroke="var(--surface-1)" stroke-width="2"/>'
        f"{end_label}{hover}{xlabels}</svg>"
    )


def _line_centered_svg(items: list[tuple[str, float]], value_name: str) -> str:
    """Line chart whose y-domain spans negative and positive values
    (error series): zero gridline emphasized, same mark specs as
    _line_svg."""
    if not items:
        return "<p class='sub'>no data</p>"
    vals = [v for _, v in items]
    ymin, ymax = min(vals + [0.0]), max(vals + [0.0])
    pad = (ymax - ymin or 1.0) * 0.1
    ymin, ymax = ymin - pad, ymax + pad
    pw, ph = _W - _ML - _MR, _H - _MT - _MB

    def sy(v: float) -> float:
        return _MT + ph - (v - ymin) / (ymax - ymin) * ph

    n = len(items)
    xs = [_ML + (pw if n == 1 else i * pw / (n - 1)) for i in range(n)]
    ys = [sy(v) for v in vals]
    # label the DATA extremes at their true mapped positions (labeling
    # the padded frame edges with unpadded values would sit each label
    # a pad-width away from where that value actually maps)
    vmax_d, vmin_d = max(vals), min(vals)
    grid = (
        f'<line class="axis" x1="{_ML}" y1="{sy(0):.1f}" x2="{_W - _MR}" y2="{sy(0):.1f}"/>'
        f'<text x="{_ML - 6}" y="{sy(0) + 4:.1f}" text-anchor="end">0</text>'
    )
    for v in (vmax_d, vmin_d):
        # skip an extreme label that would collide with the zero label
        if abs(sy(v) - sy(0)) >= 12:
            grid += (
                f'<text x="{_ML - 6}" y="{sy(v) + 4:.1f}" text-anchor="end">'
                f"{_tick_label(round(v, 3))}</text>"
            )
    pts = " ".join(f"{x:.1f},{y:.1f}" for x, y in zip(xs, ys))
    hover = "".join(
        f'<circle cx="{x:.1f}" cy="{y:.1f}" r="9" fill="transparent">'
        f"<title>{_esc(lbl)}: {_esc(v)}</title></circle>"
        for x, y, (lbl, v) in zip(xs, ys, items)
    )
    lbl_idx = {0, n - 1} | ({n // 2} if n > 4 else set())
    xlabels = "".join(
        f'<text x="{xs[i]:.1f}" y="{_H - _MB + 16}" '
        f'text-anchor="{"start" if i == 0 else "end" if i == n - 1 else "middle"}">'
        f"{_esc(items[i][0])}</text>"
        for i in sorted(lbl_idx)
    )
    return (
        f'<svg viewBox="0 0 {_W} {_H}" role="img" aria-label="{_esc(value_name)}">'
        f"{grid}"
        f'<polyline points="{pts}" fill="none" stroke="var(--series-1)" '
        f'stroke-width="2" stroke-linecap="round" stroke-linejoin="round"/>'
        f'<circle cx="{xs[-1]:.1f}" cy="{ys[-1]:.1f}" r="4" fill="var(--series-1)" '
        f'stroke="var(--surface-1)" stroke-width="2"/>'
        f"{hover}{xlabels}</svg>"
    )


def _qq_svg(qq: dict) -> str:
    """Residual Q-Q: quantile dots + least-squares normal-fit line.

    Two encodings on one panel, so this is the one chart with a legend
    (series-1 dots = residual quantiles, series-2 line = normal fit).
    """
    pts = qq["points"]
    if not pts:
        return "<p class='sub'>no data</p>"
    xs_d = [p["theo_q"] for p in pts]
    ys_d = [p["sample_q"] for p in pts]
    fit = [qq["slope"] * x + qq["intercept"] for x in xs_d]
    xmin, xmax = min(xs_d), max(xs_d)
    ymin, ymax = min(ys_d + fit), max(ys_d + fit)
    xpad = (xmax - xmin or 1.0) * 0.05
    ypad = (ymax - ymin or 1.0) * 0.08
    xmin, xmax = xmin - xpad, xmax + xpad
    ymin, ymax = ymin - ypad, ymax + ypad
    pw, ph = _W - _ML - _MR, _H - _MT - _MB

    def sx(v: float) -> float:
        return _ML + (v - xmin) / (xmax - xmin) * pw

    def sy(v: float) -> float:
        return _MT + ph - (v - ymin) / (ymax - ymin) * ph

    zero_y = sy(0.0) if ymin <= 0.0 <= ymax else None
    grid = (
        f'<line class="axis" x1="{_ML}" y1="{zero_y:.1f}" x2="{_W - _MR}" y2="{zero_y:.1f}"/>'
        f'<text x="{_ML - 6}" y="{zero_y + 4:.1f}" text-anchor="end">0</text>'
        if zero_y is not None
        else ""
    )
    line = (
        f'<line x1="{sx(xs_d[0]):.1f}" y1="{sy(fit[0]):.1f}" '
        f'x2="{sx(xs_d[-1]):.1f}" y2="{sy(fit[-1]):.1f}" '
        f'stroke="var(--series-2)" stroke-width="2" stroke-linecap="round"/>'
    )
    dots = "".join(
        f'<circle class="mark" cx="{sx(x):.1f}" cy="{sy(y):.1f}" r="4" '
        f'stroke="var(--surface-1)" stroke-width="2">'
        f"<title>theoretical {x}: sample {y}</title></circle>"
        for x, y in zip(xs_d, ys_d)
    )
    xlab = (
        f'<text x="{_ML}" y="{_H - 6}" text-anchor="start">{_esc(round(xs_d[0], 2))}</text>'
        f'<text x="{_W - _MR}" y="{_H - 6}" text-anchor="end">{_esc(round(xs_d[-1], 2))}</text>'
        f'<text x="{(_ML + _W - _MR) / 2}" y="{_H - 6}" text-anchor="middle">theoretical normal quantile</text>'
    )
    legend = (
        '<p class="legend">'
        '<span class="sw" style="background: var(--series-1); border-radius: 50%;"></span>'
        "residual quantiles"
        '<span class="sw" style="background: var(--series-2); height: 3px;"></span>'
        f"normal fit (slope {qq['slope']}, intercept {qq['intercept']}, "
        f"n = {_fmt(qq['n_residuals'])})</p>"
    )
    return legend + (
        f'<svg viewBox="0 0 {_W} {_H}" role="img" aria-label="Residual normal Q-Q plot">'
        f"{grid}{line}{dots}{xlab}</svg>"
    )


_KPI_TILES = (
    ("households", "Households"),
    ("total_records", "Daily records"),
    ("avg_daily_kwh", "Avg daily kWh"),
    ("total_kwh", "Total kWh"),
    ("anomalies_detected", "Anomalies flagged"),
    ("anomaly_rate_pct", "Anomaly rate %"),
    ("n_features", "Model features"),
)


def render_html(report: dict, title: str = "Energy analytics report") -> str:
    """Render the report dict (pipeline/report.build_report) as one
    self-contained HTML document string."""
    kpi = report.get("kpi", {})
    parts = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        "<meta name='viewport' content='width=device-width, initial-scale=1'>",
        f"<title>{_esc(title)}</title><style>{_CSS}</style></head>",
        "<body class='enrg-root'>",
        f"<h1>{_esc(title)}</h1>",
        f"<p class='sub'>period {_esc(kpi.get('period_start', '–'))} to "
        f"{_esc(kpi.get('period_end', '–'))} · engine-rendered static report "
        f"(dashboard parity: streamlit_app.py)</p>",
        "<div class='tiles'>",
    ]
    for key, label in _KPI_TILES:
        if kpi.get(key) is not None:
            parts.append(
                f"<div class='tile'><div class='lbl'>{_esc(label)}</div>"
                f"<div class='val'>{_fmt(kpi[key])}</div></div>"
            )
    parts.append("</div>")

    model = report.get("model")
    if model:
        m = model.get("metrics", {})
        parts.append("<h2>Best forecast model</h2><div class='tiles'>")
        parts.append(
            f"<div class='tile'><div class='lbl'>Model</div>"
            f"<div class='val'>{_esc(str(model.get('best_model', '–')).upper())}</div></div>"
        )
        for k in ("rmse", "mae", "r2"):
            if m.get(k) is not None:
                parts.append(
                    f"<div class='tile'><div class='lbl'>{k.upper()}</div>"
                    f"<div class='val'>{_fmt(m[k])}</div></div>"
                )
        parts.append("</div>")

    profiles = report.get("consumption_profiles") or []
    weekday = [
        (_WEEKDAYS.get(int(r["bucket"]), r["bucket"]), r["avg_daily_kwh"])
        for r in profiles
        if r["dim"] == "weekday"
    ]
    monthly = [(r["bucket"], r["avg_daily_kwh"]) for r in profiles if r["dim"] == "month"]
    parts.append("<div class='grid2'>")
    if weekday:
        parts.append(
            "<div><h2>Avg daily kWh by weekday</h2>"
            + _bar_svg(weekday, "Average daily kWh by weekday")
            + _table([r for r in profiles if r["dim"] == "weekday"])
            + "</div>"
        )
    if monthly:
        chart = _line_svg if len(monthly) > 2 else _bar_svg
        parts.append(
            "<div><h2>Avg daily kWh by month</h2>"
            + chart(monthly, "Average daily kWh by month")
            + _table([r for r in profiles if r["dim"] == "month"])
            + "</div>"
        )

    rate = [(r["month"], r["anomaly_rate_pct"]) for r in report.get("monthly_anomaly_rate") or []]
    if rate:
        chart = _line_svg if len(rate) > 2 else _bar_svg
        parts.append(
            "<div><h2>Anomaly rate % by month</h2>"
            + chart(rate, "Anomaly rate percent by month")
            + _table(report["monthly_anomaly_rate"])
            + "</div>"
        )
    wk = [
        (_WEEKDAYS.get(int(r["weekday"]), str(r["weekday"])), r["n_anomalies"])
        for r in report.get("anomalies_by_weekday") or []
    ]
    if wk:
        parts.append(
            "<div><h2>Anomalies by weekday</h2>"
            + _bar_svg(wk, "Anomaly count by weekday")
            + _table(report["anomalies_by_weekday"])
            + "</div>"
        )

    tops = [(r["entity"], r["n_anomalies"]) for r in report.get("top_anomalous_entities") or []]
    if tops:
        parts.append(
            "<div><h2>Top anomalous households</h2>"
            + _hbar_svg(tops, "Top households by anomaly count")
            + _table(report["top_anomalous_entities"])
            + "</div>"
        )
    corrs = [(r["feature"], r["abs_corr"]) for r in report.get("top_feature_correlations") or []]
    if corrs:
        parts.append(
            "<div><h2>Top |correlation| with daily kWh</h2>"
            + _hbar_svg(corrs, "Top feature correlations")
            + _table(report["top_feature_correlations"])
            + "</div>"
        )

    clusters = report.get("cluster_profile") or []
    if clusters:
        sizes = [(f"C{r['cluster']}", r["n_rows"]) for r in clusters]
        means = [(f"C{r['cluster']}", r["avg_daily_kwh"]) for r in clusters]
        parts.append(
            "<div><h2>Cluster sizes</h2>"
            + _bar_svg(sizes, "Rows per K-Means cluster")
            + "</div><div><h2>Cluster avg daily kWh</h2>"
            + _bar_svg(means, "Average consumption per cluster")
            + _table(clusters)
            + "</div>"
        )
    parts.append("</div>")  # grid2

    qq = report.get("qq_residuals")
    if qq:
        parts.append("<h2>Forecast residual normal Q-Q</h2>" + _qq_svg(qq))

    hist = report.get("error_histogram")
    parts.append("<div class='grid2'>")
    if hist:
        bars = [
            (f"{b['lo']:.2f}", b["n"]) for b in hist["bins"]
        ]
        parts.append(
            "<div><h2>Forecast error distribution</h2>"
            f"<p class='legend'>mean error {hist['mean_err']} over "
            f"{_fmt(hist['n_errors'])} residuals (bin label = lower edge)</p>"
            + _bar_svg(bars, "Forecast error histogram")
            + _table(hist["bins"])
            + "</div>"
        )
    ebd = report.get("error_by_day") or []
    if ebd:
        # always the zero-centered line: error values are signed, and
        # _bar_svg (zero-based magnitude bars) renders negative values
        # as garbage — even a 1-2 point series stays on the line form
        line = [(r["date"][5:], r["mean_err"]) for r in ebd]
        parts.append(
            "<div><h2>Mean forecast error by day</h2>"
            + _line_centered_svg(line, "Mean forecast error by day")
            + _table(ebd)
            + "</div>"
        )
    eva = report.get("error_vs_actual") or []
    pts = [r for r in eva if r["mean_err"] is not None]
    if pts:
        line = [(f"{r['actual_lo']:.1f}", r["mean_err"]) for r in pts]
        parts.append(
            "<div><h2>Mean error vs actual consumption</h2>"
            "<p class='legend'>bin label = bin's lower kWh edge</p>"
            + _line_centered_svg(line, "Mean forecast error by actual consumption bin")
            + _table(eva)
            + "</div>"
        )
    parts.append("</div>")

    parts.append("</body></html>")
    return "".join(parts)


def serve_report(html_path: str, port: int = 8000, host: str = "127.0.0.1"):
    """Bind a stdlib HTTP server that serves the rendered static report
    at "/" — the no-dependency answer to the reference's live Streamlit
    server (`visualization/streamlit_app.py:713` `streamlit run`): the
    document is pre-rendered by the engine, so "serving the dashboard"
    is just serving one file. Returns the bound ThreadingHTTPServer
    (caller runs ``serve_forever()`` / ``shutdown()``); ``port=0``
    binds an ephemeral port, read it from ``server_address[1]``. The
    file is re-read per request, so re-running ``report --html`` while
    serving updates the page on refresh. Anything but "/" or
    "/index.html" is 404 — this serves a report, not a directory.
    """
    import http.server
    import pathlib

    path = pathlib.Path(html_path)
    if not path.is_file():
        raise ValueError(f"serve_report: no rendered report at {html_path}")

    class _ReportHandler(http.server.BaseHTTPRequestHandler):
        def _respond(self, include_body: bool):
            if self.path.split("?", 1)[0] not in ("/", "/index.html"):
                self.send_error(404, "this server serves the report only")
                return
            try:
                body = path.read_bytes()
            except OSError:
                # mid-rewrite / removed report file: a retryable 503
                # beats a handler-thread traceback + dropped connection
                self.send_error(503, "report is being re-rendered, retry")
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if include_body:
                self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib handler API)
            self._respond(include_body=True)

        def do_HEAD(self):  # noqa: N802 — curl -I / proxies / health checks
            self._respond(include_body=False)

        def log_message(self, *args):  # quiet: the CLI prints the URL once
            pass

    return http.server.ThreadingHTTPServer((host, port), _ReportHandler)
