"""Import-edge extraction: per-file import/include statements → file→file edges.

North-rule operator (SURVEY.md §2.2 "import-edge extractor"): a stateless
vectorized `map_batches` regex pass per `lang` over `content`, followed by a
hash join against the corpus file table to resolve (repo, stem) targets to
concrete (repo, path) files. Regexes are compiled once at module import in
each worker process — no per-batch compilation.

Supported syntaxes (matching the synthetic corpus generator):
    python: `from repo_0003.mod_007 import x` / `import repo_0003.mod_007`
    c:      `#include "repo_0003/mod_007.h"`
    js:     `require("repo_0003/mod_007")` / `import x from "repo_0003/mod_007"`
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_PATTERNS = {
    "python": re.compile(
        r"^\s*(?:from\s+([\w.]+)\s+import|import\s+([\w.]+))", re.M),
    "c": re.compile(r'^\s*#include\s+"([^"]+)"', re.M),
    "js": re.compile(
        r'(?:require\(\s*["\']([^"\']+)["\']\s*\)|'
        r'import\s+[\w{},*\s]+\s+from\s+["\']([^"\']+)["\'])', re.M),
}


def _targets(lang: str, content: str) -> list[tuple[str, str]]:
    pat = _PATTERNS.get(lang)
    if pat is None:
        return []
    out = []
    for m in pat.finditer(content):
        tok = next(g for g in m.groups() if g)
        if lang == "python":
            parts = tok.split(".")
        else:
            parts = tok.rsplit(".", 1)[0].split("/")  # strip .h etc.
        if len(parts) < 2:
            continue
        out.append((parts[0], parts[-1]))
    return out


def _extract_batch(batch: pa.Table) -> pa.Table:
    repos = batch.column("repo").to_pylist()
    paths = batch.column("path").to_pylist()
    langs = batch.column("lang").to_pylist()
    contents = batch.column("content").to_pylist()
    s_repo, s_path, d_repo, d_stem = [], [], [], []
    for repo, path, lang, content in zip(repos, paths, langs, contents):
        for trepo, tstem in _targets(lang, content):
            s_repo.append(repo)
            s_path.append(path)
            d_repo.append(trepo)
            d_stem.append(tstem)
    return pa.table({
        "src_repo": pa.array(s_repo, pa.string()),
        "src_path": pa.array(s_path, pa.string()),
        "dst_repo": pa.array(d_repo, pa.string()),
        "dst_stem": pa.array(d_stem, pa.string()),
    })


def extract_imports(corpus_ds):
    """Corpus Dataset → Dataset[src_repo, src_path, dst_repo, dst_stem]."""
    return corpus_ds.map_batches(_extract_batch, batch_format="pyarrow",
                                 zero_copy_batch=True)


def _stem_batch(batch: pa.Table) -> pa.Table:
    paths = batch.column("path")
    # "src/mod_007.py" -> "mod_007": basename without extension (vectorized)
    base = pc.replace_substring_regex(paths, r"^.*/", "")
    stem = pc.replace_substring_regex(base, r"\.[^.]*$", "")
    return pa.table({"repo": batch.column("repo"), "path": paths,
                     "stem": stem})


def file_table(corpus_ds):
    """Distinct (repo, path, stem) — one row per file (dedup across commits)."""
    t = corpus_ds.select_columns(["repo", "path"]).map_batches(
        _stem_batch, batch_format="pyarrow", zero_copy_batch=True)
    # exact dedup on the full key (hash shuffle)
    return t.groupby(["repo", "path", "stem"]).count().drop_columns(["count()"])


def resolve_imports(imports_ds, file_table_ds,
                    num_partitions: int | None = None):
    """Hash-join extracted targets to concrete files.

    Returns Dataset[src_repo, src_path, dst_repo, dst_path] — unresolved
    imports (targets outside the corpus) are dropped (inner join).
    """
    from leiden_cuda_ray.stages.joins import hash_join

    joined = hash_join(
        imports_ds, file_table_ds,
        on=("dst_repo", "dst_stem"), right_on=("repo", "stem"),
        num_partitions=num_partitions, right_suffix="_t",
    )
    cols = joined.columns()
    path_col = "path" if "path" in cols else "path_t"
    return joined.select_columns(
        ["src_repo", "src_path", "dst_repo", path_col]).rename_columns(
        {path_col: "dst_path"})
