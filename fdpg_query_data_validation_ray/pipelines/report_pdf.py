"""PDF report sink — dependency-free PDF 1.4 writer.

Reference analog: the LaTeX/PDF report generator
(latex_report/report_visualizer.py:397-447, DataQualityReport.generate_report
renders distribution tables and severity-sorted issue tables to PDF via a
LaTeX toolchain). This engine renders the same merged report dict to a real,
spec-conformant PDF with no external toolchain: objects, content streams
(Courier, monospace so the markdown tables stay aligned), page tree and a
correct xref table are emitted by hand — ~100 lines of struct-free
byte-bookkeeping, same spirit as the BMP codec (stages/multimodal.py).

The text CONTENT is exactly the markdown report (pipelines/report_md.py), so
PDF and markdown sinks can never drift. Visual parity with the reference's
severity-colored LongTables (latex_report/report_visualizer.py:450-470, row
colors keyed on issue severity): issue-table rows get a severity-tinted
background rectangle and colored text — error red, warning amber, info blue —
drawn with plain PDF graphics operators, still toolchain-free.
"""

from __future__ import annotations

import os

from fdpg_query_data_validation_ray.pipelines.report_md import render_markdown

PAGE_W, PAGE_H = 612, 792          # US Letter, points
MARGIN, FONT_SIZE, LEADING = 36, 8, 10
LINES_PER_PAGE = (PAGE_H - 2 * MARGIN) // LEADING
MAX_CHARS = 110                    # Courier 8pt ≈ 4.8pt/char → fits the width

# Courier is WinAnsi — map the few non-Latin-1 glyphs markdown rendering uses
_CHAR_MAP = {"✓": "OK", "✗": "FAIL", "—": "-", "–": "-", "…": "...",
             "→": "->", "≤": "<=", "≥": ">="}


# severity → (text RGB, background tint RGB); matched on a markdown table
# row's severity cell, mirroring the reference's per-row LongTable colors
_SEVERITY_COLORS = {
    "error": ((0.70, 0.00, 0.00), (1.00, 0.89, 0.89)),
    "warning": ((0.65, 0.42, 0.00), (1.00, 0.96, 0.84)),
    "info": ((0.00, 0.00, 0.55), (0.88, 0.92, 1.00)),
}


def _line_severity(line: str) -> str | None:
    """Severity of a markdown TABLE row (| ... | error | ...): colored like
    the reference's issue tables; prose mentioning 'error' stays black."""
    if not line.lstrip().startswith("|"):
        return None
    cells = [c.strip().lower() for c in line.split("|")]
    for sev in _SEVERITY_COLORS:
        if sev in cells:
            return sev
    return None


def _rgb(c: tuple[float, float, float]) -> bytes:
    return (" ".join(f"{v:.2f}" for v in c)).encode()


def _pdf_text(line: str) -> bytes:
    for k, v in _CHAR_MAP.items():
        line = line.replace(k, v)
    line = line[:MAX_CHARS]
    out = line.encode("latin-1", errors="replace")
    return out.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)")


def _page_stream(lines: list[str]) -> bytes:
    severities = [_line_severity(ln) for ln in lines]
    parts = []
    # pass 1: background tint rectangles behind severity rows (drawn first
    # so the text paints over them)
    for i, sev in enumerate(severities):
        if sev is None:
            continue
        _, bg = _SEVERITY_COLORS[sev]
        y = PAGE_H - MARGIN - FONT_SIZE - i * LEADING
        parts.append(
            b"q " + _rgb(bg) + b" rg %d %d %d %d re f Q"
            % (MARGIN - 2, y - 2, PAGE_W - 2 * MARGIN + 4, LEADING)
        )
    # pass 2: the text, severity rows in their color
    parts.append(b"BT /F1 %d Tf %d %d Td %d TL" % (
        FONT_SIZE, MARGIN, PAGE_H - MARGIN - FONT_SIZE, LEADING))
    color = None
    for i, ln in enumerate(lines):
        if i:
            parts.append(b"T*")
        want = _SEVERITY_COLORS[severities[i]][0] if severities[i] else None
        if want != color:
            parts.append((_rgb(want) if want else b"0 0 0") + b" rg")
            color = want
        parts.append(b"(" + _pdf_text(ln) + b") Tj")
    parts.append(b"ET")
    return b"\n".join(parts)


def render_pdf_bytes(report: dict, title: str = "Data Quality Report",
                     registry=None) -> bytes:
    """build_report dict → complete PDF file bytes (multi-page). With a
    `registry`, the two-level routing-breakdown section renders here too
    (the PDF text IS the markdown, so the sinks cannot drift)."""
    text_lines = render_markdown(report, title, registry=registry).splitlines() or [""]
    pages = [
        text_lines[i : i + LINES_PER_PAGE]
        for i in range(0, len(text_lines), LINES_PER_PAGE)
    ]

    # object layout: 1 catalog, 2 pages, 3 font, then (page, stream) per page
    n_pages = len(pages)
    objects: dict[int, bytes] = {}
    page_ids = [4 + 2 * i for i in range(n_pages)]
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objects[3] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier"
        b" /Encoding /WinAnsiEncoding >>"
    )
    for i, page_lines in enumerate(pages):
        pid, sid = page_ids[i], page_ids[i] + 1
        objects[pid] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} {PAGE_H}]"
            f" /Resources << /Font << /F1 3 0 R >> >>"
            f" /Contents {sid} 0 R >>"
        ).encode()
        stream = _page_stream(page_lines)
        objects[sid] = (
            f"<< /Length {len(stream)} >>\nstream\n".encode()
            + stream
            + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for oid in sorted(objects):
        offsets[oid] = len(out)
        out += f"{oid} 0 obj\n".encode() + objects[oid] + b"\nendobj\n"
    xref_at = len(out)
    n_obj = max(objects) + 1
    out += f"xref\n0 {n_obj}\n".encode()
    out += b"0000000000 65535 f \n"
    for oid in range(1, n_obj):
        out += f"{offsets[oid]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n_obj} /Root 1 0 R >>\nstartxref\n{xref_at}\n"
        "%%EOF\n"
    ).encode()
    return bytes(out)


def write_pdf_report(report: dict, path: str, title: str = "Data Quality Report",
                     registry=None) -> str:
    """Atomic PDF sink next to the markdown/json sinks."""
    data = render_pdf_bytes(report, title, registry=registry)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path
