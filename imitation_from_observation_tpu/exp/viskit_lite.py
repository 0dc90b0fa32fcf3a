"""viskit-lite: aggregate, plot and SERVE experiment progress.csv trees.

Capability match for the reference's Flask viskit
(rllab/viskit/frontend.py:38-536): walk experiment directories for
``progress.csv`` + ``variant.json``, group curves by a variant key, and plot
mean±std across seeds for any logged column (the paper's "Mean True Reward
vs Iteration" plots, notebooks/plots.ipynb). Three surfaces:

- importable (``load_experiments`` / ``group_curves`` / ``plot``)
- CLI png emit (``python -m ...viskit_lite <root> --y ReturnTrue --out p.png``)
- interactive dashboard (``... <root> --serve [--port 5000]``): a stdlib
  http.server with the frontend's y-column / x-column / group-by selectors
  rendering plots on demand (the Flask+plotly UI role without the web
  dependencies this image lacks).
"""

from __future__ import annotations

import argparse
import csv
import json
import os
from collections import defaultdict

import numpy as np


def load_experiments(root: str) -> list[dict]:
    """Find all progress.csv under root; attach their variant.json if any."""
    exps = []
    for dirpath, _, files in os.walk(root):
        if "progress.csv" not in files:
            continue
        with open(os.path.join(dirpath, "progress.csv")) as f:
            rows = list(csv.DictReader(f))
        if not rows:
            continue
        columns: dict[str, np.ndarray] = {}
        for key in rows[0]:
            vals = []
            for r in rows:
                try:
                    vals.append(float(r[key]))
                except (TypeError, ValueError):
                    vals.append(np.nan)
            columns[key] = np.asarray(vals)
        variant = {}
        vpath = os.path.join(dirpath, "variant.json")
        if os.path.exists(vpath):
            with open(vpath) as f:
                variant = json.load(f)
        exps.append(dict(dir=dirpath, progress=columns, variant=variant))
    return exps


def group_curves(
    exps: list[dict], y_key: str, group_by: str | None = None, x_key: str = "Iteration"
):
    """-> {group_label: (x, mean, std)} across experiments in the group."""
    groups: dict[str, list] = defaultdict(list)
    for e in exps:
        if y_key not in e["progress"]:
            continue
        label = str(e["variant"].get(group_by, "all")) if group_by else "all"
        groups[label].append(e)
    out = {}
    for label, group in groups.items():
        n = min(len(e["progress"][y_key]) for e in group)
        ys = np.stack([e["progress"][y_key][:n] for e in group])
        x = (
            group[0]["progress"][x_key][:n]
            if x_key in group[0]["progress"]
            else np.arange(n)
        )
        out[label] = (x, ys.mean(axis=0), ys.std(axis=0))
    return out


def render_png_bytes(
    root: str, y_key: str, group_by: str | None = None, x_key: str = "Iteration",
    curves: dict | None = None,
) -> bytes:
    """Mean±std grouped curves as PNG bytes — the single figure builder
    shared by the ``plot`` CLI path and the dashboard (empty result sets
    render a titled empty figure; the CLI raises instead). Pass ``curves``
    (a ``group_curves`` result) to skip re-walking/parsing the tree."""
    import io

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if curves is None:
        curves = group_curves(load_experiments(root), y_key, group_by, x_key)
    fig, ax = plt.subplots(figsize=(7, 4.5))
    for label, (x, mean, std) in sorted(curves.items()):
        ax.plot(x, mean, label=label)
        ax.fill_between(x, mean - std, mean + std, alpha=0.25)
    ax.set_xlabel(x_key)
    ax.set_ylabel(y_key)
    if curves:
        ax.legend()
    else:
        ax.set_title(f"no experiments with column {y_key!r}")
    fig.tight_layout()
    buf = io.BytesIO()
    fig.savefig(buf, format="png", dpi=120)
    plt.close(fig)
    return buf.getvalue()


def plot(root: str, y_key: str, out_path: str, group_by: str | None = None, x_key: str = "Iteration"):
    curves = group_curves(load_experiments(root), y_key, group_by, x_key)
    if not curves:
        raise ValueError(f"no experiments with column {y_key!r} under {root}")
    with open(out_path, "wb") as f:
        f.write(render_png_bytes(root, y_key, group_by, x_key, curves=curves))
    return out_path


def dashboard_html(root: str, y_key: str, x_key: str, group_by: str) -> str:
    """Selector page (the frontend.py group/split/y-attribute UI)."""
    from html import escape

    exps = load_experiments(root)
    columns = sorted({k for e in exps for k in e["progress"]})
    variant_keys = sorted({k for e in exps for k in e["variant"]})

    def options(items, selected):
        return "".join(
            f'<option value="{escape(i)}"{" selected" if i == selected else ""}>'
            f"{escape(i)}</option>"
            for i in items
        )

    rows = "".join(
        f"<tr><td>{escape(os.path.relpath(e['dir'], root))}</td>"
        f"<td>{len(next(iter(e['progress'].values())))} itrs</td>"
        f"<td><code>{escape(json.dumps(e['variant'])[:120])}</code></td></tr>"
        for e in exps
    )
    return f"""<!doctype html><html><head><title>viskit-lite</title></head>
<body style="font-family: sans-serif; margin: 2em">
<h2>viskit-lite — {escape(root)} ({len(exps)} experiments)</h2>
<form method="get">
  y: <select name="y">{options(columns, y_key)}</select>
  x: <select name="x">{options(columns, x_key)}</select>
  group by: <select name="group_by">{options([""] + variant_keys, group_by)}</select>
  <input type="submit" value="plot">
</form>
<img src="/plot.png?y={escape(y_key)}&x={escape(x_key)}&group_by={escape(group_by)}"
     style="max-width: 100%">
<h3>experiments</h3>
<table border="1" cellpadding="4">{rows}</table>
</body></html>"""


def serve(root: str, port: int = 5000, y_default: str = "AverageReturn"):
    """Bind the dashboard server and return it WITHOUT serving — the caller
    decides between ``serve_forever()`` (the ``--serve`` CLI does this) and
    driving requests manually (tests use ``port=0`` + ``handle_request``)."""
    from http.server import BaseHTTPRequestHandler, HTTPServer
    from urllib.parse import parse_qs, urlparse

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            url = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(url.query).items()}
            y = q.get("y", y_default)
            x = q.get("x", "Iteration")
            group_by = q.get("group_by", "")
            try:
                if url.path == "/plot.png":
                    body = render_png_bytes(root, y, group_by or None, x)
                    ctype = "image/png"
                else:
                    body = dashboard_html(root, y, x, group_by).encode()
                    ctype = "text/html; charset=utf-8"
                self.send_response(200)
            except Exception as e:  # surface errors in the browser, keep serving
                body = f"viskit-lite error: {type(e).__name__}: {e}".encode()
                ctype = "text/plain"
                self.send_response(500)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    server = HTTPServer(("127.0.0.1", port), Handler)
    return server


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("root")
    p.add_argument("--y", default="AverageReturn")
    p.add_argument("--x", default="Iteration")
    p.add_argument("--group-by")
    p.add_argument("--out", default="plot.png")
    p.add_argument("--serve", action="store_true", help="interactive dashboard")
    p.add_argument("--port", type=int, default=5000)
    a = p.parse_args(argv)
    if a.serve:
        server = serve(a.root, a.port, a.y)
        print(f"viskit-lite dashboard: http://127.0.0.1:{server.server_address[1]}/")
        server.serve_forever()
        return
    print(plot(a.root, a.y, a.out, a.group_by, a.x))


if __name__ == "__main__":
    main()
