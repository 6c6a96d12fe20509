"""Stdlib linter: the load-bearing pylint subset, zero dependencies.

The reference repo gates CI on pylint >= 9.5
(/root/reference/.github/workflows/pylint.yml, .pylintrc:2); this image
has no pylint/pyflakes, so this reimplements the precise (no-false-
positive) slice of that ruleset on the stdlib ast module. Exit 1 on any
finding.

Checks: syntax errors, unused imports (W0611), mutable default
arguments (W0102), bare except (W0702), singleton comparison with
==/!= (C0121), f-strings without interpolation (W1309), duplicate
dict-literal keys (W0109), assert on a non-empty tuple (W0199), and
line length > 100 (C0301, matching the reference .pylintrc max).

Usage: python scripts/lint.py [paths...]   (default: package + harness)
"""

import ast
import sys
from pathlib import Path

DEFAULT_PATHS = [
    "graphem_rapids_tpu", "tests", "benchmarks", "examples", "scripts",
    "bench.py", "__graft_entry__.py", "setup_native.py",
]

# names whose import is a side-effect or re-export contract
IGNORE = {"annotations"}


def check_file(path):
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]
    lines = src.splitlines()

    def noqa(lineno):
        return "noqa" in lines[lineno - 1]

    imported = {}  # local name -> (lineno, qualified)
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                local = a.asname or a.name.split(".")[0]
                imported[local] = (node.lineno, a.name)
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                local = a.asname or a.name
                imported[local] = (node.lineno, a.name)

    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            pass  # the base Name node is walked separately
    # names re-exported via __all__ strings count as used
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    for el in ast.walk(node.value):
                        if isinstance(el, ast.Constant) and isinstance(
                            el.value, str
                        ):
                            used.add(el.value)

    problems = []
    for local, (lineno, qual) in sorted(imported.items()):
        if local not in used and local not in IGNORE and not noqa(lineno):
            problems.append(
                f"{path}:{lineno}: unused import: {qual}"
                + (f" (as {local})" if local != qual else "")
            )

    def flag(node, msg):
        if not noqa(node.lineno):
            problems.append(f"{path}:{node.lineno}: {msg}")

    # a FormattedValue's format_spec (":.3f") is itself a JoinedStr with
    # no placeholders — not a W1309
    spec_ids = {
        id(node.format_spec)
        for node in ast.walk(tree)
        if isinstance(node, ast.FormattedValue) and node.format_spec
    }

    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in node.args.defaults + node.args.kw_defaults:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    flag(d, "mutable default argument (W0102)")
        elif isinstance(node, ast.ExceptHandler):
            if node.type is None:
                flag(node, "bare except (W0702)")
        elif isinstance(node, ast.Compare):
            for op, right in zip(node.ops, node.comparators):
                if isinstance(op, (ast.Eq, ast.NotEq)) and isinstance(
                    right, ast.Constant
                ) and right.value in (True, False, None) and isinstance(
                    right.value, (bool, type(None))
                ):
                    flag(node, f"comparison with {right.value!r} should "
                         "use is/is not (C0121)")
        elif isinstance(node, ast.JoinedStr):
            if id(node) not in spec_ids and not any(
                isinstance(v, ast.FormattedValue) for v in node.values
            ):
                flag(node, "f-string without interpolation (W1309)")
        elif isinstance(node, ast.Dict):
            seen = set()
            for k in node.keys:
                if isinstance(k, ast.Constant):
                    try:
                        if k.value in seen:
                            flag(k, f"duplicate dict key {k.value!r} "
                                 "(W0109)")
                        seen.add(k.value)
                    except TypeError:
                        pass
        elif isinstance(node, ast.Assert):
            if isinstance(node.test, ast.Tuple) and node.test.elts:
                flag(node, "assert on a non-empty tuple is always true "
                     "(W0199)")

    for i, line in enumerate(lines, 1):
        if len(line) > 100 and "noqa" not in line:
            problems.append(f"{path}:{i}: line too long "
                            f"({len(line)} > 100) (C0301)")
    return problems


def main(argv):
    paths = argv or DEFAULT_PATHS
    files = []
    for p in paths:
        p = Path(p)
        if p.is_dir():
            files.extend(sorted(p.rglob("*.py")))
        elif p.suffix == ".py":
            files.append(p)
    problems = []
    for f in files:
        problems.extend(check_file(f))
    for line in problems:
        print(line)
    print(f"lint: {len(files)} files, {len(problems)} problems")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
