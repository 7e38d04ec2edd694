"""Static HTML report sink (SURVEY.md §2.1 S12).

The reference renders duplicate groups into an HTML page, chunked 25
groups per page, and serves it with a tiny Flask app whose DELETE
endpoint removes a picture (reference: src/simages/duplicate_images/
duplicate_finder.py:304-339). The engine analog: render the (small,
groups ≪ corpus) paged report driver-side into a static HTML file; the
DELETE endpoint's job is the `apply-policy` CLI stage (ACID rewrite), not
an HTTP server.

Rendering is deliberately driver-side Python over collected rows — the
report page is bounded by page_size, never corpus-sized.
"""

from __future__ import annotations

import html as _html
import json
from typing import Iterable, Mapping

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>Duplicate report — page {page}</title>
<style>
body {{ font-family: sans-serif; margin: 2em; }}
.group {{ border: 1px solid #ccc; margin: 1em 0; padding: .8em; }}
.group h3 {{ margin: 0 0 .4em 0; }}
table {{ border-collapse: collapse; }}
td, th {{ border: 1px solid #ddd; padding: .2em .6em; text-align: left; }}
.keeper {{ background: #e6ffe6; }}
nav {{ margin: 1em 0; }}
</style></head><body>
<h1>Duplicate groups</h1>
<p>{n_groups} groups on this page (page {page} of {n_pages},
{page_size}/page).</p>
<nav>{nav}</nav>
{groups}
</body></html>
"""

_GROUP = """<div class="group">
<h3>cluster {cluster_id} — {total} members{trunc}</h3>
<table><tr>{header}</tr>
{rows}
</table></div>
"""


def _member_rows(items: Iterable[Mapping]) -> tuple[str, str]:
    items = list(items)
    if not items:
        return "", ""
    cols = list(items[0].keys())
    header = "".join(f"<th>{_html.escape(str(c))}</th>" for c in cols)
    rows = []
    for i, it in enumerate(items):
        cls = ' class="keeper"' if i == 0 else ""  # items[0] is the keeper
        cells = "".join(
            f"<td>{_html.escape(str(it.get(c, '')))}</td>" for c in cols
        )
        rows.append(f"<tr{cls}>{cells}</tr>")
    return header, "\n".join(rows)


def render_html_report(
    group_rows: list[Mapping],
    page: int,
    page_size: int,
    n_pages: int,
    link_pattern: str = "report_p{page}.html",
) -> str:
    """group_rows: collected dicts with cluster_id, total and optionally
    `items` (list of member dicts, keeper first) — one report page.
    `link_pattern` names the sibling page files the nav links point at;
    the CLI derives it from the actual --html filename so links are live
    whatever the pages are called. A group whose items were capped by
    `duplicate_groups(max_members=...)` gets an explicit "showing N of
    total" marker — the never-silent-cap contract applies to the report
    page too, not just `group_metrics`."""
    blocks = []
    for g in group_rows:
        items = g.get("items") or []
        if isinstance(items, str):  # checkpointed groups store items as JSON
            items = json.loads(items)
        total = int(g["total"])
        trunc = (
            f" (showing {len(items)} of {total})"
            if items and len(items) < total
            else ""
        )
        header, rows = _member_rows(items)
        blocks.append(
            _GROUP.format(
                cluster_id=_html.escape(str(g["cluster_id"])),
                total=_html.escape(str(g["total"])),
                trunc=_html.escape(trunc),
                header=header,
                rows=rows,
            )
        )
    nav = " | ".join(
        f"<b>{p}</b>"
        if p == page
        else f'<a href="{_html.escape(link_pattern.format(page=p))}">{p}</a>'
        for p in range(1, n_pages + 1)
    )
    return _PAGE.format(
        page=page,
        n_pages=n_pages,
        n_groups=len(group_rows),
        page_size=page_size,
        nav=nav,
        groups="\n".join(blocks),
    )
