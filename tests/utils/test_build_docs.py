"""The static docs builder: markdown-subset rendering correctness and a
full-site build over the real docs tree."""

import importlib.util
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "build_docs",
    os.path.join(os.path.dirname(__file__), "..", "..", "scripts",
                 "build_docs.py"))
build_docs = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(build_docs)


def test_headers_get_ids():
    out = build_docs.render("## Measured numbers\ntext")
    assert '<h2 id="measured-numbers">Measured numbers</h2>' in out


def test_code_fence_is_escaped_verbatim():
    out = build_docs.render("```\na < b & **not bold**\n```")
    assert "<pre><code>a &lt; b &amp; **not bold**</code></pre>" in out


def test_inline_code_wins_over_emphasis():
    out = build_docs.render("use `a**b**c` here")
    assert "<code>a**b**c</code>" in out
    assert "<strong>" not in out


def test_table_renders():
    out = build_docs.render("| a | b |\n|---|---|\n| 1 | **2** |")
    assert "<table>" in out and "<th>a</th>" in out
    assert "<td><strong>2</strong></td>" in out


def test_md_links_rewritten_to_html():
    out = build_docs.render("see [serving](serving.md#daemon) and "
                            "[api](api/index.md)")
    assert 'href="serving.html#daemon"' in out
    assert 'href="api_index.html"' in out
    out = build_docs.render("[jax](https://jax.dev/a.md)")
    assert 'href="https://jax.dev/a.md"' in out  # external untouched


def test_nested_lists_close():
    out = build_docs.render("- a\n  - b\n- c\n\ntail")
    assert out.count("<ul>") == out.count("</ul>") == 2
    assert "<li>b</li>" in out


def test_ordered_lists():
    out = build_docs.render("1. first\n2. second\n\ntail")
    assert "<ol>" in out and out.count("<li>") == 2 and "</ol>" in out


def test_full_site_builds(tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(build_docs, "OUT", str(tmp_path))
    assert build_docs.build() == 0
    pages = os.listdir(tmp_path)
    assert "index.html" in pages and "api_index.html" in pages
    index = open(tmp_path / "index.html").read()
    assert "<nav>" in index and 'href="performance.html"' in index
    # every intra-site href must resolve to a built page
    import re
    for page in pages:
        content = open(tmp_path / page).read()
        for href in re.findall(r'href="([^"#]+)(?:#[^"]*)?"', content):
            if re.match(r"^[a-z]+://", href):
                continue
            assert href in pages, f"{page} links to missing {href}"
