"""Minimal offline linter (flake8/black are not installable on this rig).

Checks the subset of flake8 rules that bit us in CI review: line length
(E501 at 88 columns, matching ``.flake8``), trailing whitespace (W291/W293),
tabs (W191), and unused ``import``/``from ... import`` names (F401) via a
conservative AST + token scan.  Exits non-zero on any finding so it can gate
commits the way CI's flake8 step does.

Usage: ``python tools/lint.py [paths...]`` (defaults to the package, tests,
bench and entry scripts).
"""

from __future__ import annotations

import ast
import io
import sys
import tokenize
from pathlib import Path

MAX_LEN = 88

DEFAULT_PATHS = [
    "ahocorasick_rs_tpu",
    "tests",
    "tools",
    "bench.py",
    "perf_probe.py",
    "__graft_entry__.py",
]


def iter_py(paths: list[str]) -> list[Path]:
    out: list[Path] = []
    for p in paths:
        path = Path(p)
        if path.is_dir():
            out.extend(sorted(path.rglob("*.py")))
        elif path.suffix == ".py":
            out.append(path)
    return out


def unused_imports(tree: ast.AST, source: str) -> list[tuple[int, str]]:
    imported: dict[str, int] = {}  # name -> lineno
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                name = a.asname or a.name.split(".")[0]
                imported[name] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                imported[a.asname or a.name] = node.lineno
    if not imported:
        return []
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            base = node
            while isinstance(base, ast.Attribute):
                base = base.value
            if isinstance(base, ast.Name):
                used.add(base.id)
    # names referenced in __all__ strings or docstring-free re-exports
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            used.add(node.value)
    return sorted(
        (ln, name)
        for name, ln in imported.items()
        if name not in used
    )


def main() -> int:
    paths = sys.argv[1:] or DEFAULT_PATHS
    problems = 0
    for f in iter_py(paths):
        src = f.read_text()
        for i, line in enumerate(src.splitlines(), 1):
            if len(line) > MAX_LEN:
                print(f"{f}:{i}: E501 line too long ({len(line)} > {MAX_LEN})")
                problems += 1
            if line != line.rstrip():
                print(f"{f}:{i}: W291 trailing whitespace")
                problems += 1
            if "\t" in line:
                print(f"{f}:{i}: W191 tab in line")
                problems += 1
        try:
            tree = ast.parse(src)
        except SyntaxError as e:
            print(f"{f}:{e.lineno}: E999 {e.msg}")
            problems += 1
            continue
        for ln, name in unused_imports(tree, src):
            print(f"{f}:{ln}: F401 '{name}' imported but unused")
            problems += 1
        # basic token sanity (catches stray characters flake8 would flag)
        try:
            list(tokenize.generate_tokens(io.StringIO(src).readline))
        except tokenize.TokenError as e:
            print(f"{f}: tokenize error: {e}")
            problems += 1
    if problems:
        print(f"\n{problems} problem(s)")
        return 1
    print("lint clean")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
