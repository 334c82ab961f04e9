"""Window-rotation planner for the driver's 50-query correctness gate.

The driver oracle-checks only the first 50 entries of
``__spark_entry__.queries()`` per round. Since r9 the window
SELF-ROTATES (``__spark_entry__._rotate_window``: stalest committed
green grades first, ``FORCE_WINDOW`` pins for acute churn), so the
chronic promote-the-oldest bookkeeping this tool used to drive by
hand happens automatically. The tool remains the AUDITOR: it
cross-references every recorded ``CORRECTNESS_r*.json`` with the
rotated order and reports each query's position, window membership,
and best driver verdict — and, critically, its staleness analysis is
the input for ``FORCE_WINDOW`` (grade-age rotation cannot see code
churn under a fresh grade; this tool can).

It is also STALENESS-AWARE: a green grade from round N is only as good
as the code that round graded. For every query whose best verdict is a
PASS, the tool checks (a) whether the query's registered function
source in ``__spark_entry__.py`` differs from the version at the
grading commit and (b) whether any ``iotstream`` module the function
uses (directly, or one import-hop deep) changed since that commit. A
green-but-stale grade (the r4 ``dedup_report`` case: implementation
rewritten in r4, last graded r2) is flagged for re-grading.

Usage: python tools/window_plan.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# Driver/judge artifacts — churn in these never makes a grade stale.
_ARTIFACT_RE = re.compile(
    r"^(CORRECTNESS_|BENCH_|VERDICT|ADVICE|README|COVERAGE|PLANS|PROGRESS"
    r"|SURVEY|BASELINE|TESTDATA|FIXTURES|PAPERS|SNIPPETS|tests/|tools/)"
)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=False
    ).stdout


_SHOW_CACHE: dict[tuple[str, str], str] = {}
_READ_CACHE: dict[str, str | None] = {}


def _show_cached(commit: str, path: str) -> str:
    """Memoized `git show commit:path` — the refinement runs per
    (query × changed file) and would otherwise spawn the identical
    subprocess dozens of times per round."""
    key = (commit, path)
    if key not in _SHOW_CACHE:
        _SHOW_CACHE[key] = _git("show", f"{commit}:{path}")
    return _SHOW_CACHE[key]


def _read_cached(path: str) -> str | None:
    if path not in _READ_CACHE:
        try:
            _READ_CACHE[path] = open(os.path.join(REPO, path)).read()
        except OSError:
            _READ_CACHE[path] = None
    return _READ_CACHE[path]


def _round_num(path: str) -> int:
    m = re.search(r"r(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else -1


def _grade_commit(round_path: str) -> str:
    """Commit that recorded this round's CORRECTNESS file — the grading
    ran against (the snapshot parent of) this commit, and nothing but
    driver artifacts lands between snapshot and record."""
    return _git(
        "log", "-1", "--format=%H", "--", os.path.basename(round_path)
    ).strip()


def _entry_aliases(entry_src: str) -> dict[str, str]:
    """alias -> dotted module, from `from iotstream.x import y as alias`
    and `from iotstream.x import y` at the top of __spark_entry__."""
    aliases: dict[str, str] = {}
    for m in re.finditer(
        r"^from (iotstream[\w.]*) import ([\w, ()\n]+?)(?=\n\S|\n$)",
        entry_src,
        re.M,
    ):
        base, names = m.group(1), m.group(2)
        for part in re.split(r"[,\n()]+", names):
            part = part.strip()
            if not part:
                continue
            if " as " in part:
                name, alias = (s.strip() for s in part.split(" as "))
            else:
                name = alias = part
            dotted = f"{base}.{name}"
            aliases[alias] = (
                dotted if _module_file(dotted) else base
            )  # symbol import → owning module
    return aliases


def _module_file(dotted: str) -> str | None:
    rel = dotted.replace(".", "/")
    for cand in (f"{rel}.py", f"{rel}/__init__.py"):
        if os.path.exists(os.path.join(REPO, cand)):
            return cand
    return None


def _func_source(entry_src: str, func_name: str) -> str | None:
    """Extract one top-level `def func_name(...)` block by indentation."""
    m = re.search(rf"^def {re.escape(func_name)}\(.*?(?=^\S)", entry_src, re.M | re.S)
    return m.group(0) if m else None


def _modules_used(
    func_src: str, aliases: dict[str, str], helper_srcs: dict[str, str]
) -> set[str]:
    """iotstream module FILES a query function touches: alias refs +
    inline `from iotstream...` imports + entry-level helper calls, then
    one transitive hop through each module's own iotstream imports."""
    mods: set[str] = set()
    frontier = set(re.findall(r"from (iotstream[\w.]*) import", func_src))
    for alias, dotted in aliases.items():
        if re.search(rf"\b{re.escape(alias)}\b", func_src):
            frontier.add(dotted)
    for helper, src in helper_srcs.items():
        if re.search(rf"\b{re.escape(helper)}\(", func_src):
            # helper bodies contribute DOTTED names to the frontier
            # (same scan as the function source), never file paths
            frontier.update(re.findall(r"from (iotstream[\w.]*) import", src))
            for alias, dotted in aliases.items():
                if re.search(rf"\b{re.escape(alias)}\b", src):
                    frontier.add(dotted)
    for dotted in frontier:
        f = _module_file(dotted) or _module_file(
            dotted.rsplit(".", 1)[0] if "." in dotted else dotted
        )
        if f:
            mods.add(f)
    # one import-hop: the modules those modules pull in
    for f in list(mods):
        try:
            src = open(os.path.join(REPO, f)).read()
        except OSError:
            continue
        for dotted in re.findall(r"from (iotstream[\w.]*) import", src):
            g = _module_file(dotted)
            if g:
                mods.add(g)
    return mods


def _module_block(src: str, name: str) -> str | None:
    """Top-level `def name(...)` / `class name` / `NAME =` block in a
    module's source, by indentation — INCLUDING any decorator lines
    immediately above (a decorator-argument change alters behavior
    without touching the def body).

    AST-first since r8 (ADVICE r7): the r7 indentation regex could not
    span column-0 content INSIDE a block — a black-wrapped signature
    closing at column 0 (fixed in r7 by excluding ``)``/``]``/``}``)
    or a multi-line string whose lines/closing quotes start at column
    0 (the r7 fix could not cover string CONTENT) — and truncated
    fragments compared equal, silently under-flagging staleness.
    ``ast`` line spans are exact for every such shape; the regex
    remains only as the fallback for unparseable source."""
    try:
        import ast

        tree = ast.parse(src)
    except SyntaxError:
        tree = None
    if tree is not None:
        import ast

        lines = src.splitlines(True)
        for node in tree.body:
            names: list[str] = []
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                names = [node.name]
            elif isinstance(node, ast.Assign):
                names = [
                    t.id for t in node.targets if isinstance(t, ast.Name)
                ]
            elif isinstance(node, ast.AnnAssign) and isinstance(
                node.target, ast.Name
            ):
                names = [node.target.id]
            if name not in names:
                continue
            start = node.lineno
            decs = getattr(node, "decorator_list", [])
            if decs:
                start = min(d.lineno for d in decs)
            return "".join(lines[start - 1 : node.end_lineno])
        return None
    m = re.search(
        rf"^((?:@[^\n]*\n)*)(?:def {re.escape(name)}\(|class {re.escape(name)}\b"
        rf"|{re.escape(name)}(?::[^=\n]+)? =).*?(?=^[^\s)\]}}\"']|\Z)",
        src,
        re.M | re.S,
    )
    return m.group(0) if m else None


def _preamble(src: str) -> str:
    """Module code outside top-level def/class blocks (imports,
    constants, decorator-free statements) — changes here can affect
    every resident function. AST-based since r8, same rationale as
    ``_module_block``: the indentation heuristic leaked column-0
    string content from def bodies into the preamble (conservative
    over-flagging, but it burned window-rotation slots). Falls back to
    the heuristic for unparseable source."""
    try:
        import ast

        tree = ast.parse(src)
    except SyntaxError:
        tree = None
    if tree is not None:
        lines = src.splitlines(True)
        drop = set()
        for node in tree.body:
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                start = node.lineno
                if node.decorator_list:
                    start = min(d.lineno for d in node.decorator_list)
                drop.update(range(start, node.end_lineno + 1))
        return "".join(
            ln for i, ln in enumerate(lines, 1) if i not in drop
        )
    out, skipping = [], False
    for line in src.splitlines(True):
        if re.match(r"^(def |class |@)", line):
            skipping = True
            continue
        if skipping:
            if line[:1] not in (" ", "\t", "\n", ")"):
                skipping = False
            else:
                continue
        if not skipping:
            out.append(line)
    return "".join(out)


def _reachable_preamble(src: str, closure_src: str) -> str:
    """The slice of a module's preamble the query can actually observe
    (VERDICT r12 item 5): assignments and imports whose bound names are
    referenced — transitively — from the query's block closure, plus
    every other module-level statement (bare expressions, if/try
    blocks, ``__future__`` imports: arbitrary module code can have side
    effects, so those stay in unconditionally). Comparing THIS instead
    of the whole preamble stops a pure module-level constant or
    import-line ADDITION from staling every consumer of the module
    (r12: 30 pins burned on behavior-neutral preamble churn).

    Runs to a fixed point so a constant referenced only by another
    included constant (``A = B + 1``; the closure uses ``A``) still
    pulls ``B`` in. Unparseable source falls back to the full
    ``_preamble`` — conservative, never under-flagging."""
    import ast

    try:
        tree = ast.parse(src)
    except SyntaxError:
        return _preamble(src)
    lines = src.splitlines(True)
    # stmts: (source position, bound names or None=unconditional, text)
    stmts: list[tuple[int, set[str] | None, str]] = []
    for node in tree.body:
        if isinstance(
            node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ):
            continue  # def/class blocks are compared per-function
        text = "".join(lines[node.lineno - 1 : node.end_lineno])
        bound: set[str] = set()
        if isinstance(node, ast.Assign):
            for t in node.targets:
                for n in ast.walk(t):
                    if isinstance(n, ast.Name):
                        bound.add(n.id)
        elif isinstance(node, (ast.AnnAssign, ast.AugAssign)) and isinstance(
            node.target, ast.Name
        ):
            bound.add(node.target.id)
        elif isinstance(node, ast.Import):
            bound = {a.asname or a.name.split(".")[0] for a in node.names}
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                bound = set()  # semantics-bearing: always include
            else:
                bound = {a.asname or a.name for a in node.names}
        stmts.append((node.lineno, bound or None, text))

    take = {i for i, (_, bound, _) in enumerate(stmts) if bound is None}
    ref_text = closure_src + "".join(stmts[i][2] for i in take)
    changed = True
    while changed:
        changed = False
        for i, (_, bound, text) in enumerate(stmts):
            if i in take or bound is None:
                continue
            if any(re.search(rf"\b{re.escape(n)}\b", ref_text) for n in bound):
                take.add(i)
                ref_text += text
                changed = True
    # source order keeps the compare stable: a statement that merely
    # MOVED still compares equal only if its relative order held —
    # reordering assignments can change behavior, so that stays stale.
    return "".join(stmts[i][2] for i in sorted(take))


def _used_names_per_module(
    func_src: str, aliases: dict[str, str]
) -> dict[str, set[str]]:
    """dotted module -> names the query function actually uses from it:
    `from iotstream.x import a, b` names + `alias.attr` attribute refs
    for module-object aliases."""
    used: dict[str, set[str]] = {}
    # line-based parse (a lazy multi-line regex both missed consecutive
    # indented imports and over-captured following code lines):
    # single-line `from m import a, b` plus parenthesized blocks.
    lines = func_src.splitlines()
    i = 0
    while i < len(lines):
        m = re.match(r"\s*from (iotstream[\w.]*) import (.+)$", lines[i])
        if m:
            base, names = m.group(1), m.group(2)
            if names.rstrip().endswith("("):
                body = []
                i += 1
                while i < len(lines) and ")" not in lines[i]:
                    body.append(lines[i])
                    i += 1
                if i < len(lines):
                    body.append(lines[i].split(")")[0])
                names = ",".join(body)
            for part in names.split(","):
                part = part.strip().split(" as ")[0].strip("() \t")
                if part:
                    used.setdefault(base, set()).add(part)
        i += 1
    for alias, dotted in aliases.items():
        for m in re.finditer(rf"\b{re.escape(alias)}\.(\w+)", func_src):
            used.setdefault(dotted, set()).add(m.group(1))
    return used


def _behavior_key(block: str | None) -> str | None:
    """Comparison key for a top-level block that ignores what cannot
    change behavior: comments, formatting, and leading docstrings
    (AST dump with docstring Expr nodes removed). A caveat added to a
    function's docstring must not flag every query using the function
    as stale (r7: a comment-only edit to ``neardup_editdist`` burned
    a window-rotation flag). Unparseable fragments fall back to the
    raw text — conservative, never under-flagging."""
    if block is None:
        return None
    import ast

    try:
        tree = ast.parse(block)
    except SyntaxError:
        return block
    for node in ast.walk(tree):
        body = getattr(node, "body", None)
        if (
            isinstance(body, list)
            and body
            and isinstance(body[0], ast.Expr)
            and isinstance(body[0].value, ast.Constant)
            and isinstance(body[0].value.value, str)
        ):
            node.body = body[1:]
    return ast.dump(tree)


def _block_closure(src: str, names: set[str]) -> tuple[str, bool]:
    """Concatenated source of the ``names`` blocks in ``src`` plus the
    same-module helpers they (transitively) REFERENCE — the slice of
    the module this query can actually execute. Second return is False
    when nothing resolved (caller falls back conservative).

    The frontier expands on bare-name references to the module's
    top-level defs/classes, not just call syntax ``name(``: a helper
    passed as a value (to mapInPandas/applyInPandas, as a decorator,
    stored in a dict) is reachable without ever appearing as
    ``name(`` (ADVICE r7 — the call-only scan let
    ``_refined_module_stale`` conclude a changed module was provably
    unreachable and silently under-flag). Top-level CONSTANTS stay
    out of the frontier by design: they live in the module preamble,
    which `_refined_module_stale` compares separately."""
    top_defs = set(re.findall(r"^(?:def|class) (\w+)\b", src, re.M))
    frontier, seen, parts = set(names), set(), []
    while frontier:
        n = frontier.pop()
        if n in seen:
            continue
        seen.add(n)
        b = _module_block(src, n)
        if not b:
            continue
        parts.append(b)
        for ref in top_defs - seen:
            if re.search(rf"\b{re.escape(ref)}\b", b):
                frontier.add(ref)
    return "".join(parts), bool(parts)


def _refined_module_stale(
    func_src: str,
    aliases: dict[str, str],
    changed_files: set[str],
    commit: str,
) -> set[str]:
    """Function-level staleness for changed module files: a flagged
    module only makes the grade stale if (a) its preamble changed,
    (b) a function the query actually USES changed (including one hop
    of same-module helpers it calls — a DELETED helper counts as
    changed), or (c) usage can't be resolved (conservative fallback to
    module-level staleness). Returns the subset of ``changed_files``
    still considered stale.

    The one-hop reachability is SLICE-precise (r7): when a changed
    file f is only reachable through another used module g, the names
    g imports from f count only if they are referenced inside the
    query's block closure IN g — a function-local import of f by some
    unrelated g-function (vocab_build pulling ext/ranks) must not
    flag every query that touches g (word_counts etc. never execute
    ranks code). Provable block-level unreachability clears f; an
    unresolvable closure stays conservative."""
    stale: set[str] = set()
    used = _used_names_per_module(func_src, aliases)
    show, read = _show_cached, _read_cached
    # map dotted -> file for lookup
    by_file: dict[str, set[str]] = {}
    for dotted, names in used.items():
        f = _module_file(dotted) or _module_file(
            dotted.rsplit(".", 1)[0] if "." in dotted else dotted
        )
        if f:
            by_file.setdefault(f, set()).update(names)
    for f in changed_files:
        new_src = read(f)
        if new_src is None:
            stale.add(f)
            continue
        old_src = show(commit, f)
        if not old_src:
            # File did not exist at the grade commit. If the query's
            # DIRECT used-name set reaches it, something was rewired
            # onto the new file (a rename/move with the entry import
            # header updated but the def block unchanged) — stale. If
            # it is only reachable via the conservative module hop, the
            # graded code cannot have depended on it — not stale.
            if by_file.get(f):
                stale.add(f)
            continue
        names = set(by_file.get(f, set()))
        # transitive: names imported from f by OTHER used modules —
        # restricted to imports the query's block closure in g can
        # actually reach
        unresolved_hop = False
        for g in by_file:
            if g == f:
                continue
            gsrc = read(g)
            if gsrc is None:
                continue
            dotted_f = f[:-3].replace("/", ".").removesuffix(".__init__")
            imported: set[str] = set()
            for m in re.finditer(
                rf"from {re.escape(dotted_f)} import ([\w, ()\n]+?)(?=\n\S|\n$)",
                gsrc,
                re.M,
            ):
                for part in re.split(r"[,\n()]+", m.group(1)):
                    part = part.strip().split(" as ")[0].strip()
                    if part:
                        imported.add(part)
            if not imported:
                continue
            closure_src, resolved = _block_closure(gsrc, by_file[g])
            if not resolved:
                names.update(imported)  # can't slice g — conservative
                unresolved_hop = True
                continue
            names.update(
                x
                for x in imported
                if re.search(rf"\b{re.escape(x)}\b", closure_src)
            )
        if not names:
            # No direct usage, and every import of f by a used module
            # sits outside the query's block closure (an unresolvable
            # closure would have added g's imports above, making
            # ``names`` non-empty): f is provably unreachable from
            # this query's slice — the graded code path cannot have
            # executed anything in f. (Scope: ``from x import y``
            # style only, which is the only import style in-repo.)
            continue
        # behavior-key, not raw text: dropping def/class blocks leaves
        # their blank separator lines behind, so a PURE FUNCTION
        # ADDITION (r11: schemas.event_time_only) textually changes the
        # preamble of every sibling-consumer's module and falsely
        # staled 6 out-of-window grades. The AST key sees only real
        # preamble statements (imports, constants, module code).
        # Since r13 the compared preamble is REACHABILITY-SLICED
        # (VERDICT r12 item 5): only statements whose bound names the
        # query's block closure (transitively) references take part, so
        # a pure constant/import ADDITION no longer mass-pins every
        # consumer of the module. Unresolvable closures fall back to
        # the whole-preamble compare — conservative.
        closure_old, ok_old = _block_closure(old_src, names)
        closure_new, ok_new = _block_closure(new_src, names)
        if ok_old and ok_new:
            pre_old = _reachable_preamble(old_src, closure_old)
            pre_new = _reachable_preamble(new_src, closure_new)
        else:
            pre_old, pre_new = _preamble(old_src), _preamble(new_src)
        if _behavior_key(pre_old) != _behavior_key(pre_new):
            stale.add(f)
            continue
        # one helper hop: same-module names called inside used blocks
        frontier, seen = set(names), set()
        differs = False
        while frontier and not differs:
            name = frontier.pop()
            if name in seen:
                continue
            seen.add(name)
            nb, ob = _module_block(new_src, name), _module_block(old_src, name)
            if _behavior_key(nb) != _behavior_key(ob):
                differs = True
                break
            if nb:
                for callee in re.findall(r"\b(\w+)\(", nb):
                    if callee in seen:
                        continue
                    # admit callees defined in EITHER version: a helper
                    # deleted from new_src (or newly added) must enter
                    # the frontier so the None-vs-block compare fires
                    if _module_block(new_src, callee) or _module_block(
                        old_src, callee
                    ):
                        frontier.add(callee)
        if differs:
            stale.add(f)
    return stale


def _oracle_map_at(entry_src: str) -> dict[str, str] | None:
    """Evaluate ``oracle_sql()`` from an old ``__spark_entry__`` source
    snapshot. Grading-criteria changes are invisible to the code-diff
    staleness checks: editing an oracle string (e.g. the r5
    ``_JACCARD_ORACLE_UNCAPPED`` derivation) re-defines what "green"
    means without touching the query function. Executes against the
    CURRENT iotstream package (old package states aren't
    reconstructible without a checkout), which still catches every edit
    to the entry-file oracle strings/constants — where all oracles
    live. Returns None when the old source no longer executes (renamed
    imports); callers degrade to a printed warning, not a flag storm."""
    import types

    ns = types.ModuleType("_entry_at_grade")
    ns.__file__ = os.path.join(REPO, "__spark_entry__.py")
    try:
        exec(compile(entry_src, "__spark_entry__@grade", "exec"), ns.__dict__)
        return dict(ns.oracle_sql())
    except Exception:  # noqa: BLE001 — any failure: comparison unavailable
        return None


def main() -> int:
    import __spark_entry__ as entrymod

    WINDOW = entrymod.DRIVER_WINDOW

    qmap = entrymod.queries()
    order = list(qmap.keys())
    oracles = set(entrymod.oracle_sql().keys())

    # Rank verdicts PASS > rows-only > FAIL and keep the best across
    # rounds (numeric round order — lexicographic would let r9 shadow
    # r10), so a later rows-only/pass result upgrades an earlier FAIL.
    RANK = {"FAIL": 0, "rows-only": 1, "PASS": 2}
    rounds = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")), key=_round_num)
    best: dict[str, tuple[int, str, int]] = {}
    for path in rounds:
        data = json.load(open(path))
        for name, res in data.items():
            if res.get("hash_match"):
                kind = "PASS"
            elif res.get("rows_match"):
                kind = "rows-only"
            else:
                kind = "FAIL"
            entry = (RANK[kind], f"{kind} ({os.path.basename(path)})", _round_num(path))
            if name not in best or entry[0] >= best[name][0]:
                best[name] = entry
    verdict = {name: label for name, (_, label, _) in best.items()}

    never = [q for q in order if q not in verdict and q in oracles]
    in_window_never = [q for q in never if order.index(q) < WINDOW]
    out_window_never = [q for q in never if order.index(q) >= WINDOW]

    print(f"{len(order)} declared; {len(oracles)} with oracles; "
          f"window = first {WINDOW}")
    print(f"\nnever driver-checked, IN window ({len(in_window_never)}):")
    for q in in_window_never:
        print(f"  {order.index(q):3d} {q}")
    print(f"\nnever driver-checked, OUT of window ({len(out_window_never)})"
          " — promote these next round:")
    for q in out_window_never:
        print(f"  {order.index(q):3d} {q}")

    # ---- staleness: green grades older than the code they graded ----
    entry_path = os.path.join(REPO, "__spark_entry__.py")
    entry_now = open(entry_path).read()
    aliases = _entry_aliases(entry_now)
    helper_srcs = {
        h: src
        for h in ("_sensor", "_valid", "_flat", "load_table", "sensorize")
        if (src := _func_source(entry_now, h))
    }
    grade_commits = {_round_num(p): _grade_commit(p) for p in rounds}
    changed_since: dict[int, set[str]] = {}
    entry_then: dict[int, str] = {}
    for rn, commit in grade_commits.items():
        if not commit:
            continue
        diff = _git("diff", "--name-only", commit, "HEAD")
        changed_since[rn] = {
            f for f in diff.splitlines() if f and not _ARTIFACT_RE.match(f)
        }
        entry_then[rn] = _git("show", f"{commit}:__spark_entry__.py")

    # oracle text at each grading round, for grade-criteria staleness
    oracle_now = dict(entrymod.oracle_sql())
    oracle_then: dict[int, dict[str, str] | None] = {}
    for rn, src in entry_then.items():
        oracle_then[rn] = _oracle_map_at(src)
        if oracle_then[rn] is None:
            print(
                f"warning: r{rn} entry snapshot no longer executes — "
                "oracle-change staleness not checked for that round",
                file=sys.stderr,
            )

    stale: list[tuple[str, str, str]] = []
    for q in order:
        if q not in best or best[q][0] != RANK["PASS"]:
            continue
        rn = best[q][2]
        if rn not in changed_since:
            continue
        fname = getattr(qmap[q], "__name__", "<lambda>")
        fsrc_now = (
            _func_source(entry_now, fname) if fname != "<lambda>" else None
        ) or ""
        reasons = []
        if fname != "<lambda>" and fsrc_now and rn in entry_then:
            fsrc_then = _func_source(entry_then[rn], fname)
            # None = the function did not exist under this name at the
            # grading round (renamed/new implementation) — that IS a
            # change, not a pass.
            if _behavior_key(fsrc_then) != _behavior_key(fsrc_now):
                reasons.append("entry fn changed")
        mods = _modules_used(fsrc_now, aliases, helper_srcs)
        # Queries registered as module-level functions (e.g. the TPC-H
        # pack binds xtpch.* directly) have no entry-level def — their
        # implementing file comes from the function's own __module__.
        owner = getattr(qmap[q], "__module__", "")
        if owner.startswith("iotstream"):
            f = _module_file(owner)
            if f:
                mods.add(f)
        # Function-level refinement: a changed module only stales this
        # grade if the query's actually-used functions (or the module
        # preamble, or an unresolvable usage) changed — an edit to one
        # resident function must not burn window slots for its
        # siblings.
        raw_touched = mods & changed_since[rn]
        if raw_touched:
            commit = grade_commits.get(rn, "")
            refined = _refined_module_stale(
                fsrc_now, aliases, raw_touched, commit
            )
            mods = refined | (mods - raw_touched)
        touched = sorted(mods & changed_since[rn])
        if touched:
            reasons.append("module(s): " + ", ".join(touched))
        # grade-criteria change: the oracle string that defined "green"
        # at round rn differs from today's
        om = oracle_then.get(rn)
        if om is not None and q in oracle_now and om.get(q) != oracle_now[q]:
            reasons.append("oracle changed")
        if reasons:
            stale.append((q, verdict[q], "; ".join(reasons)))

    print(f"\ngreen grades now STALE — code changed since grading round "
          f"({len(stale)}); any OUT-of-window ones must be pinned in "
          "__spark_entry__.FORCE_WINDOW (age-based auto-rotation cannot "
          "see code churn under a fresh grade):")
    for q, v, why in stale:
        pos = order.index(q)
        mark = "in-window" if pos < WINDOW else "OUT-of-window"
        print(f"  {pos:3d} {q}  {v}  [{mark}]  {why}")

    print("\nwindow slots spent on already-green queries:")
    stale_names = {q for q, _, _ in stale}
    for q in order[:WINDOW]:
        if verdict.get(q, "").startswith("PASS") and q not in stale_names:
            print(f"  {order.index(q):3d} {q}  {verdict[q]}")

    # Exit code for automation (run_matrix's walker leg): the
    # freshness invariant is violated exactly when a query the driver
    # will NOT grade this round needs grading — a churn-stale green or
    # a never-graded oracle out of the window. In-window entries are
    # about to be re-graded; they are the rotation WORKING, not a
    # failure.
    out_stale = [q for q, _, _ in stale if order.index(q) >= WINDOW]
    if out_window_never or out_stale:
        print(
            f"\nFAIL: {len(out_stale)} stale green(s) and "
            f"{len(out_window_never)} never-graded orphan(s) OUT of "
            "window — pin them in __spark_entry__.FORCE_WINDOW"
        )
        return 1
    print("\nOK: every stale or ungraded query sits inside the window")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
