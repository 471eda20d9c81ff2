"""Include/exclude glob matching + visitor — the reference's
``sema.commons.glob`` surface (globbery.py: ``getMatchingGlobPaths``,
``pathMatchesGlob``, ``visitGlobPaths``, ``GlobMatchVisitor``),
consumed by its harvest config builder, syncfs service, subyt sources
and RO-crate creator.

Two semantics coexist, exactly as in the reference:

- *include* patterns use ``Path.glob`` semantics — left-anchored
  relative to the root, ``**`` crosses directories;
- *exclude* patterns (and the visitor's ``applying`` keys) use
  ``Path.match`` semantics — right-anchored suffix match where ``**``
  behaves like ``*`` (one segment, CPython ≤3.12 behavior the
  reference runs under).

Both are compiled to regexes here so the same rules run driver-side
(`matching_glob_paths`) and as column expressions over a distributed
file listing (`glob_filter_col` — at corpus scale the listing itself
is a DataFrame, not a python loop).
"""

from __future__ import annotations

import os
import re
from abc import ABC, abstractmethod
from pathlib import Path
from typing import Any, Dict, Iterable, List, Optional, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

Patterns = Union[str, List[str]]


def _seg_regex(seg: str) -> str:
    """One glob segment → regex (no '/' crossing): * and ** → [^/]*,
    ? → [^/], [...] classes pass through, the rest is escaped."""
    out = []
    i = 0
    while i < len(seg):
        c = seg[i]
        if c == "*":
            # '**' inside one segment collapses to '*'
            while i + 1 < len(seg) and seg[i + 1] == "*":
                i += 1
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        elif c == "[":
            j = seg.find("]", i + 1)
            if j < 0:
                out.append(re.escape(c))
            else:
                body = seg[i + 1 : j]
                if body.startswith("!"):
                    body = "^" + body[1:]
                out.append("[" + body + "]")
                i = j
        else:
            out.append(re.escape(c))
        i += 1
    return "".join(out)


def match_regex(pattern: str) -> str:
    """``Path.match`` semantics: right-anchored; '**' == one segment."""
    segs = [s for s in pattern.split("/") if s not in ("", ".")]
    body = "/".join(_seg_regex(s) for s in segs)
    return f"(?:^|/){body}$"


def glob_regex(pattern: str) -> str:
    """``Path.glob`` semantics: left-anchored relative path; a full
    '**' segment crosses zero or more directories. A TRAILING '**'
    matches the prefix itself plus everything under it (Path.glob
    yields the directories; relative paths carry no trailing slash, so
    the segment form must not demand one)."""
    segs = [s for s in pattern.split("/") if s not in ("", ".")]
    if segs and segs[-1] == "**":
        head = segs[:-1]
        body = "/".join(_seg_regex(s) for s in head)
        if body:
            return f"^{body}(?:/[^/]+)*$"
        return r"^[^/]+(?:/[^/]+)*$"
    parts = []  # (the trailing-** form pairs with glob_matches_dirs_only)
    for s in segs:
        if s == "**":
            parts.append("(?:[^/]+/)*")
        else:
            parts.append(_seg_regex(s) + "/")
    body = "".join(parts)
    if body.endswith("/"):
        body = body[:-1]
    return f"^{body}$"


def glob_matches_dirs_only(pattern: str) -> bool:
    """Path.glob parity: a pattern whose LAST segment is '**' yields
    directories only (the prefix dir itself plus all sub-dirs)."""
    segs = [s for s in pattern.split("/") if s not in ("", ".")]
    return bool(segs) and segs[-1] == "**"


def path_matches_glob(path: Union[str, Path], glob: str) -> bool:
    """``pathMatchesGlob`` parity (globbery.py:129-137)."""
    return re.search(match_regex(glob), Path(path).as_posix()) is not None


def _as_list(p: Optional[Patterns], default: List[str]) -> List[str]:
    if p is None:
        return list(default)
    return [p] if isinstance(p, str) else list(p)


def _walk_relative(root: Path) -> Iterable[tuple]:
    """(relpath_posix, is_dir) for everything under root, sorted."""
    entries = []
    for dirpath, dirnames, filenames in os.walk(root):
        base = Path(dirpath)
        for d in dirnames:
            entries.append(((base / d).relative_to(root).as_posix(), True))
        for f in filenames:
            entries.append(((base / f).relative_to(root).as_posix(), False))
    return sorted(entries)


def matching_glob_paths(
    root: Union[str, Path],
    includes: Patterns = None,
    excludes: Patterns = None,
    *,
    only_files: bool = False,
    make_relative: bool = True,
) -> List[Path]:
    """``getMatchingGlobPaths`` parity (globbery.py:9-46): every path
    under root matching any include glob and no exclude pattern.
    Verified against the reference's own executed fixture counts
    (tests/commons/glob/test_glob.py: 10 paths / 8 files / 5 txt / 3
    after excludes)."""
    root = Path(root)
    inc = [
        (re.compile(glob_regex(p)), glob_matches_dirs_only(p))
        for p in _as_list(includes, ["**/*"])
    ]
    exc = [re.compile(match_regex(p)) for p in _as_list(excludes, [])]
    found: List[Path] = []
    for rel, is_dir in _walk_relative(root):
        if not any(
            rx.search(rel) and (is_dir or not dirs_only)
            for rx, dirs_only in inc
        ):
            continue
        if any(rx.search(rel) for rx in exc):
            continue
        if only_files and is_dir:
            continue
        found.append(Path(rel) if make_relative else root / rel)
    return found


class GlobMatchVisitor(ABC):
    """Visitor over glob-matched paths (globbery.py:140-170)."""

    @abstractmethod
    def visitExcluded(self, path: Path) -> None: ...

    @abstractmethod
    def visitFile(self, path: Path, applying: List[Any]) -> Any: ...

    @abstractmethod
    def visitDirectory(self, path: Path, applying: List[Any]) -> Any: ...


def visit_glob_paths(
    visitor: GlobMatchVisitor,
    root: Union[str, Path],
    includes: Patterns = None,
    excludes: Patterns = None,
    applying: Optional[Dict[str, Any]] = None,
    *,
    only_files: bool = False,
    make_relative: bool = True,
) -> Dict[Path, Any]:
    """``visitGlobPaths`` parity (globbery.py:173-235): excluded paths
    get ``visitExcluded``; matched paths dispatch to file/directory
    visits with the list of ``applying`` values whose pattern matches
    (match semantics on the relative path)."""
    root = Path(root)
    inc = [
        (re.compile(glob_regex(p)), glob_matches_dirs_only(p))
        for p in _as_list(includes, ["**/*"])
    ]
    exc = [re.compile(match_regex(p)) for p in _as_list(excludes, [])]
    apply_rx = [
        (re.compile(match_regex(p)), v) for p, v in (applying or {}).items()
    ]
    results: Dict[Path, Any] = {}
    for rel, is_dir in _walk_relative(root):
        if not any(
            rx.search(rel) and (is_dir or not dirs_only)
            for rx, dirs_only in inc
        ):
            continue
        relpath = Path(rel)
        shown = relpath if make_relative else root / relpath
        if any(rx.search(rel) for rx in exc) or (only_files and is_dir):
            visitor.visitExcluded(shown)
            continue
        apps = [v for rx, v in apply_rx if rx.search(rel)]
        if is_dir:
            results[shown] = visitor.visitDirectory(root / relpath, apps)
        else:
            results[shown] = visitor.visitFile(root / relpath, apps)
    return results


def glob_filter_col(
    rel_path: Column,
    includes: Patterns = None,
    excludes: Patterns = None,
) -> Column:
    """The same include/exclude rules as a boolean column over a
    distributed listing of root-relative paths — the 100-TB form
    (e.g. filtering an Iceberg `files` metadata table or a manifest
    DataFrame instead of os.walk)."""
    inc = _as_list(includes, ["**/*"])
    exc = _as_list(excludes, [])
    cond = F.lit(False)
    for p in inc:
        cond = cond | rel_path.rlike(glob_regex(p))
    for p in exc:
        cond = cond & ~rel_path.rlike(match_regex(p))
    return cond
