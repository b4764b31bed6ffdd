"""Static single-file HTML report (S11's user-facing artifact).

The reference persists a binary report consumed by its web UI
(report.rs:198-237) and renders a browsable page per run
(cli/main.rs:675-705). This engine's equivalent is a self-contained HTML
file written next to report.json: totals header, per-tool index table,
then one section per conversation (ordered like the log_reports sink:
mean anomaly distance descending, job-output-style sources pinned first)
showing each anomaly with its before/after context.

Driver-side rendering is bounded: only anomaly rows (plus their embedded
context arrays) are collected, capped at ``max_anomalies`` with an explicit
truncation banner — never a silent cut.
"""

from __future__ import annotations

import html
from datetime import datetime, timezone

_CSS = """
body { font-family: ui-monospace, Menlo, Consolas, monospace; margin: 1.5em;
       background: #101418; color: #d8dee9; font-size: 13px; }
h1 { font-size: 18px; } h2 { font-size: 15px; margin: 1.2em 0 .3em; color: #88c0d0; }
table { border-collapse: collapse; margin: .6em 0; }
td, th { border: 1px solid #2e3440; padding: 2px 8px; text-align: left; }
.ctx { color: #6b7380; white-space: pre-wrap; }
.anom { color: #ffffff; background: #5e2a2a; white-space: pre-wrap; }
.score { color: #ebcb8b; }
.meta { color: #81a1c1; }
.trunc { color: #bf616a; font-weight: bold; }
pre { margin: 0 0 .8em; }
"""


def _esc(s) -> str:
    return html.escape(str(s if s is not None else ""))


def render_html(out: dict, max_anomalies: int = 5000) -> str:
    """Render the pipeline.run output dict to an HTML string."""
    totals = out["totals"].collect()[0]
    tools = [r.asDict() for r in out["agg_tool"].orderBy("tool").collect()]
    order = [r.conv_id for r in out["log_reports"].collect()]
    # deterministic truncation: anomalies is an unordered filter, so a bare
    # limit() would keep whichever partitions scan first (different rows
    # run to run, top-ranked conversations possibly missing). Order by the
    # stable (conv, turn, sub) key before capping.
    rows = (
        out["anomalies"]
        .select("conv_id", "turn_idx", "sub_idx", "text", "score", "before", "after")
        .orderBy("conv_id", "turn_idx", "sub_idx")
        .limit(max_anomalies + 1)
        .collect()
    )
    truncated = len(rows) > max_anomalies
    rows = rows[:max_anomalies]
    by_conv: dict[str, list] = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append(r)
    for v in by_conv.values():
        v.sort(key=lambda r: (r.turn_idx, r.sub_idx))

    parts = [
        "<!doctype html><html><head><meta charset='utf-8'>",
        "<title>logjuicer-spark report</title>",
        f"<style>{_CSS}</style></head><body>",
        "<h1>logjuicer-spark report</h1>",
        f"<p class='meta'>created {datetime.now(tz=timezone.utc).isoformat()} · "
        f"{totals.total_line_count} lines scanned · "
        f"<span class='score'>{totals.total_anomaly_count} anomalies</span></p>",
        "<table><tr><th>index</th><th>lines</th><th>anomalies</th></tr>",
    ]
    for t in tools:
        parts.append(
            f"<tr><td>{_esc(t['tool'])}</td><td>{t['line_count']}</td>"
            f"<td>{t['anomaly_count']}</td></tr>"
        )
    parts.append("</table>")
    if truncated:
        parts.append(
            f"<p class='trunc'>TRUNCATED: showing the first {max_anomalies} "
            "anomaly rows; consume the anomalies parquet sink for the full set.</p>"
        )

    ordered = [c for c in order if c in by_conv]
    ordered += [c for c in by_conv if c not in set(ordered)]
    for conv in ordered:
        parts.append(f"<h2>{_esc(conv)}</h2><pre>")
        for r in by_conv[conv]:
            for line in r.before or []:
                parts.append(f"<span class='ctx'>   | {_esc(line)}</span>\n")
            parts.append(
                f"<span class='anom'>{r.turn_idx:>4} | {_esc(r.text)}</span>"
                f" <span class='score'>[{float(r.score):.3f}]</span>\n"
            )
            for line in r.after or []:
                parts.append(f"<span class='ctx'>   | {_esc(line)}</span>\n")
            parts.append("\n")
        parts.append("</pre>")
    parts.append("</body></html>")
    return "".join(parts)


def write_html(out: dict, path: str, max_anomalies: int = 5000) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write(render_html(out, max_anomalies))
