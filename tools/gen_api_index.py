"""Generate docs/api.md: a compact API index (first docstring line per
public symbol) from the installed package.

Run from the repo root on any backend:

    python tools/gen_api_index.py > docs/api.md
"""
import importlib
import inspect
import os
import pkgutil
import sys

os.environ.setdefault("LIDBOX_NO_NATIVE", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu"):
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

import lidbox_tpu  # noqa: E402


def first_line(obj):
    doc = inspect.getdoc(obj)
    return doc.splitlines()[0].strip() if doc else ""


def iter_modules():
    yield "lidbox_tpu", lidbox_tpu
    for info in sorted(pkgutil.walk_packages(lidbox_tpu.__path__,
                                             prefix="lidbox_tpu."),
                       key=lambda i: i.name):
        if info.name.endswith("__main__"):
            continue
        try:
            yield info.name, importlib.import_module(info.name)
        except Exception as e:  # optional deps etc.
            print(f"<!-- skipped {info.name}: {type(e).__name__} -->")


def main():
    print("# API index\n")
    print("Auto-generated overview (first docstring line per public symbol).")
    print("Regenerate with `python tools/gen_api_index.py > docs/api.md`.\n")
    for name, module in iter_modules():
        print(f"## `{name}`\n")
        head = first_line(module)
        if head:
            print(head + "\n")
        rows = []
        for attr in sorted(vars(module)):
            if attr.startswith("_"):
                continue
            obj = getattr(module, attr)
            if inspect.ismodule(obj):
                continue
            defined_here = getattr(obj, "__module__", None) == name
            if not (defined_here and (inspect.isfunction(obj)
                                      or inspect.isclass(obj))):
                continue
            kind = "class" if inspect.isclass(obj) else "def"
            rows.append(f"- `{kind} {attr}` — {first_line(obj)}")
        for row in rows:
            print(row)
        if rows:
            print()


if __name__ == "__main__":
    main()
