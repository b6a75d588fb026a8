"""Build the static HTML documentation site from the markdown tree.

The reference ships a built Sphinx site (/root/reference/docs/src/ →
`make html`); this environment has no Sphinx and forbids installs, so this
is the self-contained equivalent: a ~200-line CommonMark-subset renderer
that turns `docs/**/*.md` (guides + the generated API reference) into a
navigable static site under `docs/_build/html/`, with a sidebar, intra-doc
links rewritten to `.html`, and syntax-neutral code blocks. No
dependencies beyond the stdlib; deterministic output.

Run: python scripts/build_docs.py   →  docs/_build/html/index.html
"""

import html
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = os.path.join(ROOT, "docs")
OUT = os.path.join(DOCS, "_build", "html")

CSS = """
:root { --fg:#1a1a1a; --bg:#ffffff; --accent:#0b5fa5; --muted:#6a737d;
        --code-bg:#f6f8fa; --border:#e1e4e8; --sidebar:#f9fafb; }
@media (prefers-color-scheme: dark) {
  :root { --fg:#d7dae0; --bg:#0d1117; --accent:#58a6ff; --muted:#8b949e;
          --code-bg:#161b22; --border:#30363d; --sidebar:#10151b; } }
* { box-sizing: border-box; }
body { margin:0; color:var(--fg); background:var(--bg);
       font:16px/1.6 -apple-system,'Segoe UI',Roboto,Helvetica,Arial,sans-serif; }
a { color:var(--accent); text-decoration:none; }
a:hover { text-decoration:underline; }
.layout { display:flex; min-height:100vh; }
nav { width:260px; flex:none; padding:1.2rem 1rem; background:var(--sidebar);
      border-right:1px solid var(--border); font-size:.92em;
      position:sticky; top:0; height:100vh; overflow-y:auto; }
nav h1 { font-size:1.05em; margin:0 0 .8em; }
nav ul { list-style:none; margin:0; padding:0; }
nav li { margin:.18em 0; }
nav .section { margin-top:.9em; font-weight:600; color:var(--muted);
               text-transform:uppercase; font-size:.8em; letter-spacing:.04em; }
main { flex:1; min-width:0; max-width:54rem; padding:2rem 2.5rem 4rem; }
h1,h2,h3,h4 { line-height:1.25; margin:1.6em 0 .6em; }
h1 { font-size:1.9em; margin-top:.2em;
     border-bottom:1px solid var(--border); padding-bottom:.3em; }
h2 { font-size:1.45em; border-bottom:1px solid var(--border);
     padding-bottom:.25em; }
code { font:.88em ui-monospace,SFMono-Regular,Menlo,Consolas,monospace;
       background:var(--code-bg); border-radius:4px; padding:.12em .35em; }
pre { background:var(--code-bg); border:1px solid var(--border);
      border-radius:6px; padding: .9em 1.1em; overflow-x:auto; }
pre code { background:none; padding:0; font-size:.86em; }
table { border-collapse:collapse; margin:1em 0; display:block;
        overflow-x:auto; }
th,td { border:1px solid var(--border); padding:.4em .7em; text-align:left; }
th { background:var(--code-bg); }
blockquote { margin:1em 0; padding:.2em 1em; color:var(--muted);
             border-left:4px solid var(--border); }
hr { border:none; border-top:1px solid var(--border); margin:2em 0; }
img { max-width:100%; }
.crumb { color:var(--muted); font-size:.85em; margin-bottom:1.2em; }
"""


def _inline(text):
    """Inline markdown → HTML (code spans first so nothing nests in them)."""
    parts = re.split(r"(`[^`]+`)", text)
    out = []
    for part in parts:
        if part.startswith("`") and part.endswith("`") and len(part) > 1:
            out.append(f"<code>{html.escape(part[1:-1])}</code>")
            continue
        part = html.escape(part, quote=False)
        part = re.sub(r"\[\[([^\]]+)\]\]", r"\1", part)
        part = re.sub(
            r"\[([^\]]+)\]\(([^)\s]+)\)",
            lambda m: f'<a href="{_link(m.group(2))}">{m.group(1)}</a>',
            part)
        part = re.sub(r"\*\*([^*]+)\*\*", r"<strong>\1</strong>", part)
        part = re.sub(r"(?<![\w*])\*([^*\s][^*]*)\*(?![\w*])",
                      r"<em>\1</em>", part)
        part = re.sub(r"(?<![\w`])×(\d)", r"&times;\1", part)
        out.append(part)
    return "".join(out)


def _link(href):
    """Rewrite intra-doc .md links to the built .html pages."""
    if re.match(r"^[a-z]+://", href) or href.startswith("#"):
        return href
    base, _, frag = href.partition("#")
    if base.endswith(".md"):
        base = base[:-3].replace("/", "_") + ".html"
        return base + (f"#{frag}" if frag else "")
    return href


def _slug(text):
    return re.sub(r"[^\w\- ]", "", text).strip().lower().replace(" ", "-")


def render(md):
    """Markdown → HTML body. Handles the subset these docs use: ATX
    headers, fenced code, tables, nested lists, blockquotes, hrules."""
    lines = md.split("\n")
    out, i = [], 0
    list_stack = []  # open lists: (indent, tag)

    def close_lists(to_indent=-1):
        while list_stack and (list_stack[-1][0] >= to_indent >= 0 or
                              to_indent < 0):
            out.append(f"</{list_stack[-1][1]}>")
            list_stack.pop()

    while i < len(lines):
        line = lines[i]
        stripped = line.strip()

        if stripped.startswith("```"):
            close_lists()
            i += 1
            block = []
            while i < len(lines) and not lines[i].strip().startswith("```"):
                block.append(lines[i])
                i += 1
            i += 1
            out.append("<pre><code>" +
                       html.escape("\n".join(block)) + "</code></pre>")
            continue

        m = re.match(r"^(#{1,6})\s+(.*)$", stripped)
        if m:
            close_lists()
            level = len(m.group(1))
            text = m.group(2)
            out.append(f'<h{level} id="{_slug(text)}">{_inline(text)}'
                       f"</h{level}>")
            i += 1
            continue

        if stripped.startswith("|") and i + 1 < len(lines) and \
                re.match(r"^\|[\s:|-]+\|?\s*$", lines[i + 1].strip()):
            close_lists()
            header = [c.strip() for c in stripped.strip("|").split("|")]
            out.append("<table><thead><tr>" +
                       "".join(f"<th>{_inline(c)}</th>" for c in header) +
                       "</tr></thead><tbody>")
            i += 2
            while i < len(lines) and lines[i].strip().startswith("|"):
                cells = [c.strip()
                         for c in lines[i].strip().strip("|").split("|")]
                out.append("<tr>" +
                           "".join(f"<td>{_inline(c)}</td>" for c in cells) +
                           "</tr>")
                i += 1
            out.append("</tbody></table>")
            continue

        m = re.match(r"^(\s*)(?:[-*]|(\d+)\.)\s+(.*)$", line)
        if m and not re.match(r"^\s*[-*]{3,}\s*$", line):
            indent = len(m.group(1))
            tag = "ol" if m.group(2) else "ul"
            if not list_stack or indent > list_stack[-1][0]:
                out.append(f"<{tag}>")
                list_stack.append((indent, tag))
            else:
                while len(list_stack) > 1 and indent < list_stack[-1][0]:
                    out.append(f"</{list_stack[-1][1]}>")
                    list_stack.pop()
            # continuation lines of this item
            item = [m.group(3)]
            while (i + 1 < len(lines) and lines[i + 1].strip() and
                   not re.match(r"^\s*([-*#>|]|```|\d+\.)", lines[i + 1]) and
                   len(lines[i + 1]) - len(lines[i + 1].lstrip()) > indent):
                i += 1
                item.append(lines[i].strip())
            out.append(f"<li>{_inline(' '.join(item))}</li>")
            i += 1
            continue
        close_lists()

        if re.match(r"^\s*([-*_]\s*){3,}$", stripped) and stripped:
            out.append("<hr>")
            i += 1
            continue

        if stripped.startswith(">"):
            quote = []
            while i < len(lines) and lines[i].strip().startswith(">"):
                quote.append(lines[i].strip()[1:].strip())
                i += 1
            out.append(f"<blockquote><p>{_inline(' '.join(quote))}"
                       "</p></blockquote>")
            continue

        if not stripped:
            i += 1
            continue

        para = []
        while i < len(lines) and lines[i].strip() and \
                not re.match(r"^\s*([-*#>|]|```)", lines[i]):
            para.append(lines[i].strip())
            i += 1
        if para:
            out.append(f"<p>{_inline(' '.join(para))}</p>")
        else:
            i += 1
    close_lists()
    return "\n".join(out)


def page_title(md, fallback):
    m = re.search(r"^#\s+(.*)$", md, re.M)
    return m.group(1).strip("`* ") if m else fallback


def build():
    pages = {}  # rel md path -> (title, html body)
    for dirpath, dirnames, filenames in os.walk(DOCS):
        dirnames[:] = [d for d in dirnames if d != "_build"]
        for fn in sorted(filenames):
            if not fn.endswith(".md"):
                continue
            rel = os.path.relpath(os.path.join(dirpath, fn), DOCS)
            with open(os.path.join(dirpath, fn)) as f:
                md = f.read()
            title = page_title(md, os.path.splitext(fn)[0])
            pages[rel] = (title, render(md))

    guides = sorted(p for p in pages if "/" not in p)
    api = sorted(p for p in pages if p.startswith("api/"))

    def nav_html(current):
        items = ['<h1><a href="index.html">simplesr_tpu</a></h1>']
        items.append('<div class="section">Guides</div><ul>')
        for p in guides:
            href = _link(p)
            mark = " aria-current='page'" if p == current else ""
            items.append(f'<li><a href="{href}"{mark}>'
                         f"{html.escape(pages[p][0])}</a></li>")
        items.append("</ul>")
        items.append('<div class="section">API reference</div><ul>')
        items.append(f'<li><a href="{_link("api/index.md")}">Module index'
                     "</a></li>")
        items.append("</ul>")
        return "\n".join(items)

    os.makedirs(OUT, exist_ok=True)
    for rel, (title, body) in pages.items():
        out_name = _link(rel)
        doc = f"""<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{html.escape(title)} — simplesr_tpu</title>
<style>{CSS}</style></head>
<body><div class="layout">
<nav>{nav_html(rel)}</nav>
<main><div class="crumb">{html.escape(rel)}</div>
{body}
</main></div></body></html>
"""
        with open(os.path.join(OUT, out_name), "w") as f:
            f.write(doc)

    print(f"built {len(pages)} pages -> {os.path.relpath(OUT, ROOT)}/")
    return 0


if __name__ == "__main__":
    sys.exit(build())
