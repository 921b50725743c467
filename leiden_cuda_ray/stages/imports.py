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


# vectorized extraction specs: (statement regex, token-capture regex,
# split mode). Semantics identical to _PATTERNS + _targets.
_VEC_SPECS = {
    "python": (r"(?m)^[^\S\n]*(?:from[^\S\n]+[\w.]+[^\S\n]+import"
               r"|import[^\S\n]+[\w.]+)",
               r"(?:from|import)\s+([\w.]+)", "dot"),
    "c": (r'(?m)^[^\S\n]*#include[^\S\n]+"[^"]+"', r'"([^"]+)"', "slash"),
    "js": (r'(?:require\(\s*["\'][^"\']+["\']\s*\)'
           r'|import\s+[\w{},*\s]+\s+from\s+["\'][^"\']+["\'])',
           r'["\']([^"\']+)["\']', "slash"),
}


def _extract_batch(batch: pa.Table) -> pa.Table:
    """Vectorized per-lang extraction: polars str.extract_all + explode
    (one C pass per lang instead of a Python loop over rows × matches);
    falls back to the compiled-regex row loop if polars is unavailable."""
    try:
        import polars as pl
    except ImportError:
        return _extract_batch_rowloop(batch)

    df = pl.from_arrow(batch)
    outs = []
    for lang, (stmt_pat, tok_pat, mode) in _VEC_SPECS.items():
        sub = df.filter(pl.col("lang") == lang)
        if sub.height == 0:
            continue
        m = (sub.with_columns(
                pl.col("content").str.extract_all(stmt_pat).alias("m"))
             .select(["repo", "path", "m"])
             .explode("m").drop_nulls("m")
             .with_columns(pl.col("m").str.extract(tok_pat, 1)
                           .alias("tok"))
             .drop_nulls("tok"))
        if mode == "dot":
            parts = pl.col("tok").str.split(".")
        else:  # strip extension, then path segments
            parts = (pl.col("tok").str.replace(r"\.[^./]*$", "")
                     .str.split("/"))
        m = (m.with_columns(parts.alias("parts"))
             .filter(pl.col("parts").list.len() >= 2)
             .select([
                 pl.col("repo").alias("src_repo"),
                 pl.col("path").alias("src_path"),
                 pl.col("parts").list.first().alias("dst_repo"),
                 pl.col("parts").list.last().alias("dst_stem"),
             ]))
        outs.append(m)
    if not outs:
        return pa.table({
            "src_repo": pa.array([], pa.string()),
            "src_path": pa.array([], pa.string()),
            "dst_repo": pa.array([], pa.string()),
            "dst_stem": pa.array([], pa.string()),
        })
    res = pl.concat(outs).to_arrow()
    return res.cast(pa.schema([
        ("src_repo", pa.string()), ("src_path", pa.string()),
        ("dst_repo", pa.string()), ("dst_stem", pa.string())]))


def _extract_batch_rowloop(batch: pa.Table) -> pa.Table:
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
    cols = {"repo": batch.column("repo"), "path": paths, "stem": stem}
    if "vertex" in batch.column_names:
        # derive's join-fallback path resolves import targets by stem and
        # needs the vid to come out of that single join
        cols["vertex"] = batch.column("vertex")
    return pa.table(cols)


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
