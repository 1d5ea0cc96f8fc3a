"""Local substitute for the core of ``mypy --strict`` (rig has no mypy).

AST-level enforcement of the strict checks that do not need type
inference:

* every function/method parameter is annotated (``disallow_untyped_defs``),
* every function/method has a return annotation,
* no implicit Optional: a parameter defaulting to ``None`` must spell an
  optional type (``Optional[...]``, ``... | None`` or ``Any``).

``mypy --strict`` itself runs in CI (gating, ``.github/workflows/main.yml``)
where it is installable; this checker is the dev-rig gate that keeps the
codebase from drifting unannotated between CI runs.  Zero findings required
(run by ``tools/lint.py``).
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

PACKAGE = Path(__file__).resolve().parent.parent / "ahocorasick_rs_tpu"


def _is_optional_annotation(node: ast.expr) -> bool:
    """Does the annotation admit None (Optional[...], X | None, Any, object)?"""
    if isinstance(node, ast.Constant) and node.value is None:
        return True
    if isinstance(node, ast.Name):
        return node.id in ("Any", "object", "None")
    if isinstance(node, ast.Attribute):
        return node.attr in ("Any",)
    if isinstance(node, ast.Subscript):
        base = node.value
        if isinstance(base, ast.Name) and base.id == "Optional":
            return True
        if isinstance(base, ast.Attribute) and base.attr == "Optional":
            return True
        return False
    if isinstance(node, ast.BinOp) and isinstance(node.op, ast.BitOr):
        return _is_optional_annotation(node.left) or _is_optional_annotation(
            node.right
        )
    return False


def check_file(path: Path) -> list[str]:
    src = path.read_text()
    tree = ast.parse(src, filename=str(path))
    problems: list[str] = []

    class V(ast.NodeVisitor):
        def _check_fn(
            self, node: ast.FunctionDef | ast.AsyncFunctionDef
        ) -> None:
            args = node.args
            all_args = (
                args.posonlyargs + args.args + args.kwonlyargs
            )
            skip_first = bool(all_args) and all_args[0].arg in (
                "self",
                "cls",
            )
            for i, a in enumerate(all_args):
                if i == 0 and skip_first:
                    continue
                if a.annotation is None:
                    problems.append(
                        f"{path}:{node.lineno}: parameter '{a.arg}' of "
                        f"'{node.name}' is unannotated"
                    )
            for va in (args.vararg, args.kwarg):
                if va is not None and va.annotation is None:
                    problems.append(
                        f"{path}:{node.lineno}: parameter '*{va.arg}' of "
                        f"'{node.name}' is unannotated"
                    )
            if node.returns is None:
                problems.append(
                    f"{path}:{node.lineno}: '{node.name}' has no return "
                    "annotation"
                )
            # implicit Optional: positional defaults align right-to-left
            pos = args.posonlyargs + args.args
            for a, d in zip(pos[len(pos) - len(args.defaults):],
                            args.defaults):
                if (
                    isinstance(d, ast.Constant)
                    and d.value is None
                    and a.annotation is not None
                    and not _is_optional_annotation(a.annotation)
                ):
                    problems.append(
                        f"{path}:{node.lineno}: parameter '{a.arg}' of "
                        f"'{node.name}' defaults to None but its "
                        "annotation is not Optional"
                    )
            for a, d in zip(args.kwonlyargs, args.kw_defaults):
                if (
                    d is not None
                    and isinstance(d, ast.Constant)
                    and d.value is None
                    and a.annotation is not None
                    and not _is_optional_annotation(a.annotation)
                ):
                    problems.append(
                        f"{path}:{node.lineno}: parameter '{a.arg}' of "
                        f"'{node.name}' defaults to None but its "
                        "annotation is not Optional"
                    )
            self.generic_visit(node)

        def visit_FunctionDef(self, node: ast.FunctionDef) -> None:
            self._check_fn(node)

        def visit_AsyncFunctionDef(
            self, node: ast.AsyncFunctionDef
        ) -> None:
            self._check_fn(node)

    V().visit(tree)
    return problems


def main() -> int:
    problems: list[str] = []
    for path in sorted(PACKAGE.rglob("*.py")):
        problems.extend(check_file(path))
    for p in problems:
        print(p)
    print(
        f"typecheck_lite: {len(problems)} problem(s) in package "
        f"{PACKAGE.name}"
    )
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
