"""Every recipe's CLI invocation must parse against the current argparsers.

The recipes mirror the reference's egs/ scripts (hyperparameters included);
this guards against flag drift — a renamed/removed CLI flag silently breaking
a recipe would otherwise only surface at launch time on real hardware.
"""

import pathlib
import re
import shlex

import pytest

RECIPES_DIR = pathlib.Path(__file__).parent.parent / "recipes"
RECIPES = sorted(RECIPES_DIR.glob("*.sh"))

_VAR = re.compile(r'"?\$\{[^}]*\}"?|"?\$[A-Za-z_@][A-Za-z_0-9]*"?')


def _expand(text: str) -> str:
    """Join continuations, inline COMMON=( ... ) bash arrays (with optional
    ``:off:len`` slices), and dummy out the remaining shell substitutions."""
    text = text.replace("\\\n", " ").replace('"$@"', "")
    arrays = {}
    for m in re.finditer(r"(\w+)=\(([^)]*)\)", text, re.S):
        toks = shlex.split(_VAR.sub("dummy", m.group(2)))
        arrays[m.group(1)] = toks

    def _arr(m):
        toks = arrays.get(m.group(1), [])
        if m.group(2):  # "${A[@]:off:len}"
            off, ln = int(m.group(3)), int(m.group(4))
            toks = toks[off:off + ln]
        return " ".join(toks)

    text = re.sub(r'"\$\{(\w+)\[@\](:(\d+):(\d+))?\}"', _arr, text)
    return _VAR.sub("dummy", text)


def _extract_invocations(text: str):
    """Yield (module, argv) for each ``python -m avsiam_tpu.cli.*`` call."""
    for line in _expand(text).splitlines():
        m = re.match(r"\s*python -m (avsiam_tpu\.cli\.\w+)\s+(.*)",
                     line)
        if m:
            yield m.group(1), shlex.split(m.group(2))


def _parse(module: str, argv: list, recipe: str):
    mod = __import__(module, fromlist=["build_parser"])
    try:
        return mod.build_parser().parse_args(argv)
    except SystemExit:
        pytest.fail(f"{recipe}: {module} rejected {argv}")


@pytest.mark.parametrize(
    "recipe", [r for r in RECIPES if r.name != "pretrain_audioset_multihost.sh"],
    ids=lambda p: p.name)
def test_recipe_flags_parse(recipe):
    invocations = list(_extract_invocations(recipe.read_text()))
    assert invocations, f"{recipe.name}: no CLI invocation found"
    for module, argv in invocations:
        _parse(module, argv, recipe.name)


def test_multihost_recipe_flags_parse():
    """The multihost recipe delegates to pretrain_audioset.sh, appending the
    torchrun-style rendezvous flags — the combination must parse."""
    base = list(_extract_invocations(
        (RECIPES_DIR / "pretrain_audioset.sh").read_text()))
    assert base
    module, argv = base[0]
    extra = ["--exp-dir", "d", "--coordinator_address", "h:29400",
             "--num_processes", "2", "--process_id", "0"]
    args = _parse(module, argv + extra, "pretrain_audioset_multihost.sh")
    assert args.num_processes == 2
