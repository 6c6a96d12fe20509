"""Minimal stdlib linter: syntax errors + unused imports.

The reference repo gates CI on pylint >= 9.5 (.pylintrc); this image has
no pylint/pyflakes, so this provides the load-bearing subset with zero
dependencies. Exit 1 on any finding.

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
