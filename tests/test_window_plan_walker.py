"""Staleness-walker precision guards (tools/window_plan.py).

Two r7 regressions this pins:
1. `_module_block` used to terminate at ANY column-0 character, so a
   black-wrapped multi-line signature (closing ``)`` at column 0)
   truncated the block to its first two lines — body edits then
   compared equal and staleness silently under-flagged.
2. One-hop reachability is slice-precise: a function-local import of a
   changed module by one resident of an intermediate module must not
   flag queries whose block closure never references it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import window_plan as wp  # noqa: E402

WRAPPED_A = '''\
def wrapped(
    docs, col: str = "text", min_count: int = 5
) -> int:
    return 1


def other():
    return 2
'''

WRAPPED_B = WRAPPED_A.replace("return 1", "return 99")


def test_module_block_spans_wrapped_signature_body():
    block = wp._module_block(WRAPPED_A, "wrapped")
    assert "return 1" in block  # body included, not cut at `) -> int:`
    assert "def other" not in block  # stops at the next top-level def
    assert wp._module_block(WRAPPED_A, "wrapped") != wp._module_block(
        WRAPPED_B, "wrapped"
    )


def test_module_block_closing_bracket_literals():
    src = "CONF = [\n    1,\n]\n\n\ndef f():\n    return CONF\n"
    block = wp._module_block(src, "CONF")
    assert "]" in block and "def f" not in block


def test_block_closure_walks_same_module_helpers():
    src = (
        "def a():\n    return helper()\n\n\n"
        "def helper():\n    return 1\n\n\n"
        "def unrelated():\n    return 2\n"
    )
    closure, resolved = wp._block_closure(src, {"a"})
    assert resolved
    assert "def helper" in closure
    assert "def unrelated" not in closure


def test_slice_precise_hop_does_not_flag_unrelated_queries(tmp_path, monkeypatch):
    """A module g where only `vocabish` imports the changed file f:
    a query using `wordish` (whose closure never touches f) must not
    be stale; a query using `vocabish` must be."""
    repo = tmp_path
    (repo / "pkg").mkdir()
    g_old = (
        "def wordish(x):\n    return x + 1\n\n\n"
        "def vocabish(x):\n    from pkg.ranksish import rank\n\n    return rank(x)\n"
    )
    f_old = "def rank(x):\n    return x\n"
    f_new = "def rank(x):\n    return x * 2\n"
    (repo / "pkg" / "textish.py").write_text(g_old)
    (repo / "pkg" / "ranksish.py").write_text(f_new)

    monkeypatch.setattr(wp, "REPO", str(repo))
    monkeypatch.setattr(wp, "_show_cached", lambda commit, path: f_old
                        if path == "pkg/ranksish.py" else g_old)
    monkeypatch.setattr(
        wp, "_module_file",
        lambda dotted: f"{dotted.replace('.', '/')}.py"
        if os.path.exists(os.path.join(str(repo), f"{dotted.replace('.', '/')}.py"))
        else None,
    )
    wp._READ_CACHE.clear()

    # _used_names_per_module only scans `from iotstream...` — feed it
    # aliases instead (alias -> dotted module), the other supported path.
    aliases = {"xt": "pkg.textish"}
    stale_word = wp._refined_module_stale(
        "def q(spark, sf):\n    return xt.wordish(1)\n",
        aliases, {"pkg/ranksish.py"}, "HEAD",
    )
    assert stale_word == set()
    stale_vocab = wp._refined_module_stale(
        "def q(spark, sf):\n    return xt.vocabish(1)\n",
        aliases, {"pkg/ranksish.py"}, "HEAD",
    )
    assert stale_vocab == {"pkg/ranksish.py"}


def test_pure_function_addition_does_not_stale_siblings(tmp_path, monkeypatch):
    """Adding a NEW top-level function to a module (r11: schemas.
    event_time_only) leaves blank separator lines in the def-stripped
    preamble; the raw-text preamble compare falsely staled every query
    using ANY function of that module. The AST behavior-key compare
    must clear siblings that never call the new function — while a
    real preamble change (new import / constant) still stales them."""
    repo = tmp_path
    (repo / "pkg").mkdir()
    f_old = "LIMIT = 3\n\n\ndef used(x):\n    return x + LIMIT\n"
    f_added = (
        "LIMIT = 3\n\n\ndef used(x):\n    return x + LIMIT\n\n\n"
        "def newcomer(x):\n    return x - 1\n"
    )
    f_preamble = "LIMIT = 4\n\n\ndef used(x):\n    return x + LIMIT\n"
    (repo / "pkg" / "modish.py").write_text(f_added)

    monkeypatch.setattr(wp, "REPO", str(repo))
    monkeypatch.setattr(wp, "_show_cached", lambda commit, path: f_old)
    monkeypatch.setattr(
        wp, "_module_file",
        lambda dotted: f"{dotted.replace('.', '/')}.py"
        if os.path.exists(os.path.join(str(repo), f"{dotted.replace('.', '/')}.py"))
        else None,
    )
    wp._READ_CACHE.clear()

    aliases = {"mo": "pkg.modish"}
    fsrc = "def q(spark, sf):\n    return mo.used(1)\n"
    assert wp._refined_module_stale(fsrc, aliases, {"pkg/modish.py"}, "HEAD") == set()

    # a REAL preamble change (constant edit) still stales the sibling
    (repo / "pkg" / "modish.py").write_text(f_preamble)
    wp._READ_CACHE.clear()
    assert wp._refined_module_stale(
        fsrc, aliases, {"pkg/modish.py"}, "HEAD"
    ) == {"pkg/modish.py"}


def test_behavior_key_ignores_docstrings_and_comments():
    a = 'def f(x):\n    """old docs."""\n    # a comment\n    return x + 1\n'
    b = 'def f(x):\n    """NEW docs, plus a caveat."""\n    return x + 1\n'
    c = 'def f(x):\n    """old docs."""\n    return x + 2\n'
    assert wp._behavior_key(a) == wp._behavior_key(b)  # docs/comments only
    assert wp._behavior_key(a) != wp._behavior_key(c)  # real body change
    assert wp._behavior_key(None) is None
    assert wp._behavior_key("def broken(:\n") == "def broken(:\n"  # fallback


MODULE_WITH_TOPLEVEL_STRING = '''\
def target(x):
    return helper(x)


DOC = """a module-level
multi-line string whose closing quotes sit at column 0
"""


def helper(x):
    return x + 1
'''


def test_module_block_survives_column_zero_string_close():
    """ADVICE r7: a top-level multi-line string closing at column 0
    must not terminate the PRECEDING block mid-body — the same silent
    truncation class as the wrapped-signature bug."""
    src = MODULE_WITH_TOPLEVEL_STRING.replace(
        "def target", 'S = """x\n"""\n\n\ndef target'
    )
    # DOC assignment's block must include its full string, and a def
    # that FOLLOWS a col-0 closing quote must still resolve.
    blk = wp._module_block(src, "helper")
    assert blk is not None and "x + 1" in blk
    doc_blk = wp._module_block(src, "DOC")
    assert doc_blk is not None and "column 0" in doc_blk


VALUE_REF_MODULE = '''\
def _kernel(pdf):
    return pdf


def runner(df):
    return df.mapInPandas(_kernel, schema="x long")


HANDLERS = {"k": _fallback}


def dispatch(name):
    return HANDLERS[name]


def _fallback(x):
    return x
'''


def test_block_closure_follows_value_references():
    """ADVICE r7: helpers referenced as VALUES (passed to mapInPandas,
    stored in a dict) must join the closure even though they never
    appear as ``name(`` call syntax — otherwise a changed helper looks
    provably unreachable and staleness silently under-flags."""
    closure, ok = wp._block_closure(VALUE_REF_MODULE, {"runner"})
    assert ok
    assert "def _kernel" in closure
    closure2, ok2 = wp._block_closure(VALUE_REF_MODULE, {"dispatch"})
    assert ok2
    # dict-stored handler reached through the HANDLERS constant's block?
    # HANDLERS itself lives in the preamble (constants are compared
    # there), but _fallback is referenced by name inside it — the
    # def-name scan still runs over resolved blocks only, so assert
    # the direct value-ref case too:
    assert "def _fallback" in wp._block_closure(
        VALUE_REF_MODULE, {"dispatch", "HANDLERS"}
    )[0]


def test_pure_preamble_addition_does_not_stale_consumers(tmp_path, monkeypatch):
    """VERDICT r12 item 5: a module-level CONSTANT addition (and an
    import-line addition) that no consumed function references must not
    stale the module's consumers — r12 burned 30 FORCE_WINDOW pins on
    exactly this behavior-neutral preamble churn. A change to a
    constant the used function DOES reference must still stale."""
    repo = tmp_path
    (repo / "pkg").mkdir()
    f_old = (
        "import os\n\nLIMIT = 3\n\n\n"
        "def used(x):\n    return x + LIMIT\n"
    )
    # pure additions: a new unreferenced constant AND a new import
    f_added = (
        "import os\nimport re\n\nLIMIT = 3\nNEW_KNOB = 99\n\n\n"
        "def used(x):\n    return x + LIMIT\n\n\n"
        "def newcomer(y):\n    return re.escape(str(NEW_KNOB + y))\n"
    )
    # referenced-constant edit: must stale
    f_edit = f_added.replace("LIMIT = 3", "LIMIT = 4")

    (repo / "pkg" / "modish.py").write_text(f_added)
    monkeypatch.setattr(wp, "REPO", str(repo))
    monkeypatch.setattr(wp, "_show_cached", lambda commit, path: f_old)
    monkeypatch.setattr(
        wp, "_module_file",
        lambda dotted: f"{dotted.replace('.', '/')}.py"
        if os.path.exists(os.path.join(str(repo), f"{dotted.replace('.', '/')}.py"))
        else None,
    )
    wp._READ_CACHE.clear()

    aliases = {"mo": "pkg.modish"}
    fsrc = "def q(spark, sf):\n    return mo.used(1)\n"
    assert wp._refined_module_stale(fsrc, aliases, {"pkg/modish.py"}, "HEAD") == set()

    (repo / "pkg" / "modish.py").write_text(f_edit)
    wp._READ_CACHE.clear()
    assert wp._refined_module_stale(
        fsrc, aliases, {"pkg/modish.py"}, "HEAD"
    ) == {"pkg/modish.py"}


def test_reachable_preamble_transitive_constants():
    """A constant referenced only through another included constant
    still takes part in the compare (fixed-point), and unconditional
    module-level statements (bare calls) are always included."""
    src = (
        "import warnings\n\nB = 2\nA = B + 1\nUNUSED = 0\n\n"
        "warnings.simplefilter('ignore')\n\n\n"
        "def f(x):\n    return x + A\n"
    )
    closure = wp._module_block(src, "f")
    pre = wp._reachable_preamble(src, closure)
    assert "A = B + 1" in pre
    assert "B = 2" in pre  # transitive through A
    assert "UNUSED = 0" not in pre
    # the bare warnings call is unconditional, which also pulls in the
    # import that binds the name it references
    assert "simplefilter" in pre
    assert "import warnings" in pre
