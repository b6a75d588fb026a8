"""Generate API reference docs (docs/api/*.md) from the package's live
docstrings and signatures.

The reference ships a Sphinx tree with per-module autodoc pages
(/root/reference/docs/src/modules/); this environment has no Sphinx (and no
package installs), so this is the stdlib equivalent: walk `simplesr_tpu`,
emit one markdown page per module with classes, functions, signatures and
docstrings, plus an index. Deterministic output — re-run and commit when
the API surface changes.

Run: python scripts/gen_api_docs.py
"""

import importlib
import inspect
import os
import pkgutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Doc generation never needs an accelerator — force the CPU backend BEFORE
# anything can initialize it (a module import that touches jax.devices()
# would otherwise block on an unreachable TPU tunnel; env vars alone lose
# to the platform plugin here).
import jax
jax.config.update("jax_platforms", "cpu")

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "api")
PACKAGE = "simplesr_tpu"


def _signature(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj, indent=""):
    doc = inspect.getdoc(obj)
    if not doc:
        return ""
    # drop auto-generated boilerplate (dataclass repr docstrings, object.__call__)
    name = getattr(obj, "__name__", "")
    if doc.startswith(f"{name}(") or doc == "Call self as a function.":
        return ""
    return "\n".join(indent + line for line in doc.splitlines())


def _is_local(obj, modname):
    return getattr(obj, "__module__", None) == modname


def _flax_fields(cls):
    """Flax module hyperparameters (dataclass fields minus plumbing)."""
    import dataclasses

    if not dataclasses.is_dataclass(cls):
        return []
    out = []
    for f in dataclasses.fields(cls):
        if f.name in ("parent", "name"):
            continue
        if f.default is dataclasses.MISSING:
            default = ""
        else:
            rep = getattr(f.default, "__name__", None) or repr(f.default)
            default = f" = {rep}"
        out.append(f"{f.name}{default}")
    return out


def document_module(modname):
    mod = importlib.import_module(modname)
    lines = [f"# `{modname}`", ""]
    moddoc = inspect.getdoc(mod)
    if moddoc:
        lines += [moddoc, ""]

    classes = [(n, o) for n, o in inspect.getmembers(mod, inspect.isclass)
               if _is_local(o, modname) and not n.startswith("_")]
    functions = [(n, o) for n, o in inspect.getmembers(mod, inspect.isfunction)
                 if _is_local(o, modname) and not n.startswith("_")]

    for name, cls in classes:
        fields = _flax_fields(cls)
        if fields:
            lines += [f"## class `{name}`", "",
                      "Hyperparameters: `" + "`, `".join(fields) + "`", ""]
        else:
            lines += [f"## class `{name}{_signature(cls)}`", ""]
        d = _doc(cls)
        if d:
            lines += [d, ""]
        for mname, meth in inspect.getmembers(cls, inspect.isfunction):
            if mname.startswith("_") and mname != "__call__":
                continue
            if meth.__qualname__.split(".")[0] != name:
                continue  # inherited
            lines += [f"### `{name}.{mname}{_signature(meth)}`", ""]
            md = _doc(meth)
            if md:
                lines += [md, ""]
        for mname, meth in inspect.getmembers(
                cls, lambda o: isinstance(o, staticmethod)):
            pass  # staticmethods already appear via isfunction on the class

    for name, fn in functions:
        lines += [f"## `{name}{_signature(fn)}`", ""]
        d = _doc(fn)
        if d:
            lines += [d, ""]

    return "\n".join(lines).rstrip() + "\n", bool(classes or functions or moddoc)


def main():
    os.makedirs(OUT, exist_ok=True)
    pkg = importlib.import_module(PACKAGE)
    modnames = [PACKAGE]
    for info in pkgutil.walk_packages(pkg.__path__, prefix=PACKAGE + "."):
        if "._native" in info.name:
            continue
        modnames.append(info.name)

    index = ["# API reference",
             "",
             "Generated from live docstrings by `scripts/gen_api_docs.py` "
             "(the no-Sphinx-available analogue of the reference's autodoc "
             "tree, /root/reference/docs/src/modules/).",
             ""]
    for modname in sorted(modnames):
        try:
            content, has_api = document_module(modname)
        except Exception as e:
            print(f"skip {modname}: {type(e).__name__}: {e}")
            continue
        if not has_api:
            continue
        fname = modname.replace(".", "_") + ".md"
        with open(os.path.join(OUT, fname), "w") as f:
            f.write(content)
        index.append(f"- [`{modname}`]({fname})")
        print(f"wrote {fname}")
    with open(os.path.join(OUT, "index.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print(f"wrote index.md ({len(index) - 4} modules)")


if __name__ == "__main__":
    main()
