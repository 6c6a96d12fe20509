"""The in-repo lint gate (scripts/lint.py) — the CI ruleset itself.

The reference gates CI on pylint >= 9.5
(/root/reference/.github/workflows/pylint.yml); scripts/lint.py is this
repo's zero-dependency equivalent, so its checks deserve the same
regression coverage as any other gate.
"""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "lintmod", os.path.join(REPO, "scripts", "lint.py")
)
lintmod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(lintmod)


def _problems(tmp_path, src):
    f = tmp_path / "case.py"
    f.write_text(src)
    return lintmod.check_file(f)


def test_clean_file(tmp_path):
    assert _problems(tmp_path, "import os\nprint(os.sep)\n") == []


def test_unused_import(tmp_path):
    (out,) = _problems(tmp_path, "import os\n")
    assert "unused import: os" in out


def test_noqa_suppresses(tmp_path):
    assert _problems(tmp_path, "import os  # noqa\n") == []


def test_syntax_error(tmp_path):
    (out,) = _problems(tmp_path, "def f(:\n")
    assert "syntax error" in out


def test_mutable_default(tmp_path):
    (out,) = _problems(tmp_path, "def f(x=[]):\n    return x\n")
    assert "W0102" in out


def test_bare_except(tmp_path):
    src = "try:\n    pass\nexcept:\n    pass\n"
    (out,) = _problems(tmp_path, src)
    assert "W0702" in out


def test_typed_except_ok(tmp_path):
    src = "try:\n    pass\nexcept ValueError:\n    pass\n"
    assert _problems(tmp_path, src) == []


def test_singleton_comparison(tmp_path):
    (out,) = _problems(tmp_path, "x = 1\ny = x == None\n")
    assert "C0121" in out
    # == 0 / == '' are fine (value comparisons, not singletons)
    assert _problems(tmp_path, "x = 1\ny = x == 0\n") == []


def test_fstring_without_interpolation(tmp_path):
    (out,) = _problems(tmp_path, "s = f'hello'\n")
    assert "W1309" in out


def test_format_spec_not_flagged(tmp_path):
    # ":.3f" is a JoinedStr in the AST — must NOT be a W1309
    # (regression: 44 false positives across the repo)
    assert _problems(tmp_path, "x = 1.0\ns = f'{x:.3f}'\n") == []


def test_duplicate_dict_key(tmp_path):
    (out,) = _problems(tmp_path, "d = {'a': 1, 'a': 2}\n")
    assert "W0109" in out


def test_assert_on_tuple(tmp_path):
    (out,) = _problems(tmp_path, "assert (1, 'msg')\n")
    assert "W0199" in out


def test_line_too_long(tmp_path):
    (out,) = _problems(tmp_path, "x = 1  # " + "y" * 100 + "\n")
    assert "C0301" in out


def test_repo_is_clean():
    """The default gate passes on the repo itself."""
    assert lintmod.main([]) == 0


def test_cli_exit_code(tmp_path):
    f = tmp_path / "bad.py"
    f.write_text("import os\n")
    assert lintmod.main([str(f)]) == 1
