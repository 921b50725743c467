"""Deterministic synthetic source-repo corpus (the engine's primary input).

Schema (BASELINE.json input_hint):
    repo:string, path:string, commit:string, lang:string, content:string

Planted structure mirrors the reference's clique-ring validation graph
(validation/clique_ring.txt: five 4-cliques bridged in a ring): repos are
grouped into clusters; files import densely within their cluster and exactly
one low-weight import chain bridges consecutive clusters in a ring, so the
expected Leiden communities / connected components are known by construction
(FIXTURES.md F1).

Everything is a pure function of (seed, sizes): no wall-clock, no RNG state,
no external data. Content filler is derived from blake2b of the row key so
sha256(content) is stable across runs and machines.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq

_LANGS = ("python", "c", "js")
_EXT = {"python": "py", "c": "h", "js": "js"}


@dataclass(frozen=True)
class CorpusParams:
    n_clusters: int = 2
    repos_per_cluster: int = 2
    files_per_repo: int = 8
    imports_per_file: int = 3     # intra-cluster fan-out (dense communities)
    commits_per_repo: int = 3
    giant_commit_files: int = 0   # 0 => no giant commit; else one skewed commit
    seed: int = 42


def corpus_params_for_sf(sf: float) -> CorpusParams:
    """Size tiers keyed by the driver's scale factors (TESTDATA.md)."""
    if sf <= 0.001:
        return CorpusParams(n_clusters=2, repos_per_cluster=2, files_per_repo=8,
                            imports_per_file=3, commits_per_repo=3)
    if sf <= 0.01:
        return CorpusParams(n_clusters=5, repos_per_cluster=4, files_per_repo=32,
                            imports_per_file=4, commits_per_repo=6,
                            giant_commit_files=48)
    # bench tier (sf0.1): ~256k files, ~4M planted import statements — sized
    # so per-partition superstep kernels dominate task-orchestration latency
    # and CPU scaling is observable (BASELINE.md scaling criterion)
    if sf <= 0.1:
        return CorpusParams(n_clusters=20, repos_per_cluster=8,
                            files_per_repo=1000, imports_per_file=16,
                            commits_per_repo=40, giant_commit_files=512)
    # scale tier (sf1): 1.6M files — V above moving.LOCK_DRAIN_V_MAX, so
    # full Leiden executes the distributed claims loop (the 100-TB path)
    # instead of the in-process drain
    return CorpusParams(n_clusters=40, repos_per_cluster=8,
                        files_per_repo=5000, imports_per_file=16,
                        commits_per_repo=40, giant_commit_files=512)


def _h(*parts: object) -> int:
    """Deterministic 64-bit hash of a key tuple (stable across processes)."""
    raw = "\x1f".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.blake2b(raw, digest_size=8).digest(), "big")


def _filler(key: str, n_lines: int = 4) -> list[str]:
    out = []
    for i in range(n_lines):
        d = hashlib.blake2b(f"{key}|{i}".encode(), digest_size=12).hexdigest()
        out.append(f"x_{d[:8]} = process({d[8:16]!r})  # {d[16:]}")
    return out


def _import_stmt(lang: str, repo: str, stem: str) -> str:
    if lang == "python":
        return f"from {repo}.{stem} import handle"
    if lang == "c":
        return f'#include "{repo}/{stem}.h"'
    return f'const {stem} = require("{repo}/{stem}");'


def _file_meta(params: CorpusParams, cluster: int, r: int, j: int):
    repo = f"repo_{cluster * params.repos_per_cluster + r:04d}"
    lang = _LANGS[j % len(_LANGS)]
    stem = f"mod_{j:03d}"
    path = f"src/{stem}.{_EXT[lang]}"
    return repo, path, lang, stem


def generate_corpus_rows(params: CorpusParams):
    """Yield corpus rows deterministically.

    Import targets of file (cluster, r, j): `imports_per_file` files of the
    same cluster selected by hash; plus ring bridges: file 0 of repo 0 of
    cluster k imports file 0 of repo 0 of cluster (k+1) % n_clusters
    (analogue of the bridge edges at validation/clique_ring.txt:8,17,...).
    """
    p = params
    n_files_cluster = p.repos_per_cluster * p.files_per_repo
    for cluster in range(p.n_clusters):
        for r in range(p.repos_per_cluster):
            repo, _, _, _ = _file_meta(p, cluster, r, 0)
            for j in range(p.files_per_repo):
                repo, path, lang, stem = _file_meta(p, cluster, r, j)
                my_flat = r * p.files_per_repo + j

                imports = []
                for t in range(p.imports_per_file):
                    tgt = _h(p.seed, "imp", cluster, r, j, t) % n_files_cluster
                    if tgt == my_flat:
                        tgt = (tgt + 1) % n_files_cluster
                    tr, tj = divmod(tgt, p.files_per_repo)
                    trepo, _, _, tstem = _file_meta(p, cluster, tr, tj)
                    imports.append((trepo, tstem))
                if r == 0 and j == 0 and p.n_clusters > 1:
                    nxt = (cluster + 1) % p.n_clusters
                    brepo, _, _, bstem = _file_meta(p, nxt, 0, 0)
                    imports.append((brepo, bstem))

                # commit assignment: hash into commits_per_repo buckets; the
                # giant commit (commit id c999999 of repo_0000) additionally
                # claims the first `giant_commit_files` files of repo_0000.
                cidx = _h(p.seed, "commit", repo, j) % p.commits_per_repo
                commit = f"c{cluster:02d}{r:02d}{cidx:02d}".ljust(8, "0")
                if (p.giant_commit_files and cluster == 0 and r == 0
                        and j < p.giant_commit_files):
                    commit = "c999999g"

                lines = [f"// {repo}/{path}" if lang != "python"
                         else f"# {repo}/{path}"]
                seen = set()
                for trepo, tstem in imports:
                    if (trepo, tstem) in seen:
                        continue
                    seen.add((trepo, tstem))
                    lines.append(_import_stmt(lang, trepo, tstem))
                lines.extend(_filler(f"{p.seed}|{repo}|{path}"))
                yield {
                    "repo": repo,
                    "path": path,
                    "commit": commit,
                    "lang": lang,
                    "content": "\n".join(lines) + "\n",
                }


def gen_corpus(out_path: str, params: CorpusParams | None = None,
               sf: float | None = None) -> str:
    """Write the corpus parquet (idempotent; atomic rename). Returns path."""
    if params is None:
        params = corpus_params_for_sf(sf if sf is not None else 0.001)
    if os.path.exists(out_path):
        return out_path
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    rows = list(generate_corpus_rows(params))
    table = pa.Table.from_pylist(rows, schema=pa.schema([
        ("repo", pa.string()), ("path", pa.string()), ("commit", pa.string()),
        ("lang", pa.string()), ("content", pa.string()),
    ]))
    tmp = out_path + f".tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, out_path)
    return out_path


# bump when generator params/logic change: the cache is keyed by existence
_CORPUS_VERSION = 2


def corpus_path_for_sf_dir(sf_dir: str) -> str:
    """Canonical on-disk location of the synthetic corpus for a testdata dir.

    Keyed by the sf tier name + generator version so the oracle SQL (which
    derives the same path via this helper) always reads the same file the
    Ray pipeline reads, and stale caches are never reused after a generator
    change.
    """
    tier = os.path.basename(os.path.normpath(sf_dir)) or "sf0.001"
    return f"/tmp/graft_corpus/{tier}/corpus_v{_CORPUS_VERSION}.parquet"


def ensure_corpus_for_sf_dir(sf_dir: str) -> str:
    tier = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(tier.replace("sf", ""))
    except ValueError:
        sf = 0.001
    return gen_corpus(corpus_path_for_sf_dir(sf_dir), sf=sf)


def read_corpus(path: str, columns: list[str] | None = None):
    """Corpus as a streaming Ray Dataset (column-pruned at the read)."""
    import ray.data

    return ray.data.read_parquet(path, columns=columns)
