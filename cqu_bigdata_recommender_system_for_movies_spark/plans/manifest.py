"""Mechanical change tracking for the driver-verification rotation.

VERDICT r9 #2/#3: twice in a row (r8's ``simhash_near_dup_pairs``
omission, r9's seven stale rows) the next round's window pin was
reconstructed by hand and missed queries whose implementations changed
in-round. This module makes the accounting mechanical:

- ``plans/query_manifest.json`` is a committed snapshot of every
  registered query's *implementation hash*, frozen at round start (the
  tree the previous round's driver verified).
- ``compute_query_hashes(pkg_root)`` recomputes those hashes STATICALLY
  (pure AST, no Spark, no imports) from any package tree — so it can
  diff git HEAD against the working tree.
- ``tests/test_plans.py::test_changed_queries_are_manifested`` asserts
  that the set of queries whose hash differs from the committed manifest
  equals ``registry.CHANGED_THIS_ROUND`` exactly — so any commit that
  changes a query's behavior without appending its name fails CI, and
  the next round's window head is derived from data, not memory.

The hash covers the query function's TRANSITIVE in-package closure:
its own source (including decorators, hence the oracle SQL and any
f-string constants it interpolates), every top-level function / class /
constant in the same module that it references (directly or through
other closure members), and the same across ``from <pkg>.<mod> import
name`` edges. That is what caught the r9 slip class: ``_bucket_pairs``
changed and ``minhash_lsh_dedup``'s row silently went stale even though
``minhash_lsh_dedup``'s own def was untouched.

``plans/registry.py`` and this file are excluded from closure
resolution — otherwise every window-pin edit would flag all 237 queries.

Round-boundary protocol (also in the registry's rotation comment):
1. refresh the manifest to the new round-start tree:
   ``python -m cqu_bigdata_recommender_system_for_movies_spark.plans.manifest refresh``
2. pin the next window with head = previous ``CHANGED_THIS_ROUND`` minus
   the previous window (in-window changes got fresh rows at round end);
3. reset ``CHANGED_THIS_ROUND = ()``.
"""

from __future__ import annotations

import ast
import hashlib
import json
import pathlib

PKG_NAME = "cqu_bigdata_recommender_system_for_movies_spark"
_EXCLUDED_MODULES = {f"{PKG_NAME}.plans.registry", f"{PKG_NAME}.plans.manifest"}

MANIFEST_PATH = pathlib.Path(__file__).with_name("query_manifest.json")


def _default_pkg_root() -> pathlib.Path:
    return pathlib.Path(__file__).resolve().parents[1]


class _Module:
    """Parsed module: top-level name -> source lines, package import map."""

    def __init__(self, modname: str, path: pathlib.Path):
        self.modname = modname
        is_pkg = path.name == "__init__.py"
        src = path.read_text()
        self.lines = src.splitlines()
        self.tree = ast.parse(src)
        # top-level name -> list of (start_line, end_line) 1-based inclusive;
        # a name can bind more than once (conditional defs, reassignment)
        self.defs: dict[str, list[tuple[int, int]]] = {}
        # alias -> (module name, original name) for `from <pkg>.<mod> import x`
        self.pkg_imports: dict[str, tuple[str, str]] = {}
        for node in self.tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                start = min(
                    [d.lineno for d in node.decorator_list] + [node.lineno]
                )
                self.defs.setdefault(node.name, []).append((start, node.end_lineno))
            elif isinstance(node, ast.Assign):
                for tgt in node.targets:
                    for n in ast.walk(tgt):
                        if isinstance(n, ast.Name):
                            self.defs.setdefault(n.id, []).append(
                                (node.lineno, node.end_lineno)
                            )
            elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
                self.defs.setdefault(node.target.id, []).append(
                    (node.lineno, node.end_lineno)
                )
            elif isinstance(node, ast.ImportFrom):
                mod = node.module
                if node.level:
                    # Relative import — resolve against THIS module's
                    # package path (ADVICE r10: anchoring at PKG_NAME
                    # mapped `from .dedup import X` inside operators/ to
                    # PKG.dedup, silently dropping the closure edge).
                    # For module a.b.c (non-package), level L anchors at
                    # a.b.c minus L trailing parts; a package's __init__
                    # anchors one part higher (level 1 = itself).
                    parts = self.modname.split(".")
                    drop = node.level - (1 if is_pkg else 0)
                    if not 0 <= drop < len(parts):
                        raise ValueError(
                            f"unresolvable relative import (level="
                            f"{node.level}) in {modname}:{node.lineno}"
                        )
                    anchor = ".".join(parts[: len(parts) - drop])
                    if node.module is None:
                        # `from . import x` binds a MODULE, not a def —
                        # attribute references through it are invisible
                        # to the closure walk, so refuse loudly rather
                        # than let a helper change go untracked.
                        raise ValueError(
                            f"`from . import ...` is untrackable for the "
                            f"manifest closure — use an absolute "
                            f"`from {anchor}.<mod> import name` in "
                            f"{modname}:{node.lineno}"
                        )
                    mod = f"{anchor}.{node.module}"
                if mod and mod.startswith(PKG_NAME) and mod not in _EXCLUDED_MODULES:
                    for alias in node.names:
                        self.pkg_imports[alias.asname or alias.name] = (
                            mod,
                            alias.name,
                        )

    def segment(self, span: tuple[int, int]) -> str:
        s, e = span
        return "\n".join(self.lines[s - 1 : e])


def _load_modules(pkg_root: pathlib.Path) -> dict[str, _Module]:
    mods: dict[str, _Module] = {}
    for py in sorted(pkg_root.rglob("*.py")):
        rel = py.relative_to(pkg_root).with_suffix("")
        parts = [PKG_NAME] + list(rel.parts)
        if parts[-1] == "__init__":
            parts = parts[:-1]
        modname = ".".join(parts)
        if modname in _EXCLUDED_MODULES:
            continue
        mods[modname] = _Module(modname, py)
    return mods


def _closure_sources(
    mods: dict[str, _Module], modname: str, name: str, visited: set
) -> list[tuple[str, str, str]]:
    """All (module, name, source) reachable from (modname, name)."""
    if (modname, name) in visited or modname not in mods:
        return []
    visited.add((modname, name))
    mod = mods[modname]
    out: list[tuple[str, str, str]] = []
    if name in mod.defs:
        for span in mod.defs[name]:
            seg = mod.segment(span)
            out.append((modname, name, seg))
            sub = ast.parse(_dedent_block(seg))
            # function-local `from <pkg>.<mod> import x` shadows the
            # module-level import map for names inside THIS segment
            local_imports: dict[str, tuple[str, str]] = {}
            for n in ast.walk(sub):
                if isinstance(n, ast.ImportFrom) and n.module:
                    m = n.module
                    if n.level == 1:
                        m = f"{PKG_NAME}.{m}"
                    if m.startswith(PKG_NAME) and m not in _EXCLUDED_MODULES:
                        for alias in n.names:
                            local_imports[alias.asname or alias.name] = (
                                m,
                                alias.name,
                            )
            for n in ast.walk(sub):
                if isinstance(n, ast.Name):
                    ref = n.id
                    if ref == name:
                        continue
                    if ref in local_imports:
                        tgt_mod, tgt_name = local_imports[ref]
                        out.extend(
                            _closure_sources(mods, tgt_mod, tgt_name, visited)
                        )
                    elif ref in mod.defs:
                        out.extend(_closure_sources(mods, modname, ref, visited))
                    elif ref in mod.pkg_imports:
                        tgt_mod, tgt_name = mod.pkg_imports[ref]
                        out.extend(
                            _closure_sources(mods, tgt_mod, tgt_name, visited)
                        )
    elif name in mod.pkg_imports:
        tgt_mod, tgt_name = mod.pkg_imports[name]
        out.extend(_closure_sources(mods, tgt_mod, tgt_name, visited))
    return out


def _dedent_block(seg: str) -> str:
    import textwrap

    return textwrap.dedent(seg)


def _registered_queries(mods: dict[str, _Module]) -> dict[str, tuple[str, str]]:
    """query name -> (module name, function name), from @register decorators."""
    found: dict[str, tuple[str, str]] = {}
    for modname, mod in mods.items():
        for node in mod.tree.body:
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            for dec in node.decorator_list:
                if (
                    isinstance(dec, ast.Call)
                    and isinstance(dec.func, ast.Name)
                    and dec.func.id == "register"
                    and dec.args
                    and isinstance(dec.args[0], ast.Constant)
                    and isinstance(dec.args[0].value, str)
                ):
                    qname = dec.args[0].value
                    if qname in found:
                        raise ValueError(f"duplicate register name: {qname}")
                    found[qname] = (modname, node.name)
    return found


def compute_query_hashes(pkg_root: pathlib.Path | None = None) -> dict[str, str]:
    """Static per-query implementation hash over the transitive closure."""
    mods = _load_modules(pkg_root or _default_pkg_root())
    hashes: dict[str, str] = {}
    for qname, (modname, fname) in sorted(_registered_queries(mods).items()):
        pieces = _closure_sources(mods, modname, fname, set())
        blob = "\x00".join(f"{m}:{n}\n{s}" for m, n, s in sorted(set(pieces)))
        hashes[qname] = hashlib.sha256(blob.encode()).hexdigest()
    return hashes


def refresh(path: pathlib.Path = MANIFEST_PATH) -> None:
    path.write_text(json.dumps(compute_query_hashes(), indent=0, sort_keys=True) + "\n")


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "refresh":
        refresh()
        print(f"wrote {MANIFEST_PATH}")
    else:
        print(json.dumps(compute_query_hashes(), indent=0, sort_keys=True))
