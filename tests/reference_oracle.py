"""Single-process, seed-pinned port of the reference Leiden/Louvain
SEMANTICS, used as a test oracle (SURVEY.md §5: "the seeded reference
implementation re-run as oracle").

This is an independent reimplementation of the behavior documented in
SURVEY.md §2.3-2.6 from `custom_leiden.py` / `custom_louvain.py` with the
§7.4 determinization applied: visit order = ascending vertex id (in place
of the reference's random.shuffle, custom_leiden.py:539/custom_louvain.py:
237) and greedy argmax community choice (the randomized-θ branch the
reference disables, custom_leiden.py:428-450). Structure:

- move_nodes_fast (custom_leiden.py:534-599): FIFO work queue over vertices;
  best positive-ΔCPM neighbor community; movers re-enqueue their neighbors
  not in the new community.
- refine_partition / merge_nodes_subset (custom_leiden.py:350-485):
  singleton reset; per-subset well-connectivity thresholds on AGGREGATE
  node counts; singleton-only moves; incremental community-graph updates.
- aggregate_graph + maintain_p (custom_leiden.py:493-523, 611-637):
  coarse graph over refined communities; next level's initial partition =
  each refined community labelled by its members' pre-refinement community.
- custom_louvain (custom_louvain.py:234-374): full sweeps to zero moves
  with the modularity objective, aggregate, repeat.

Pure Python/dict state — deliberately a different shape from the engine's
numpy BSP so agreement is evidence, not tautology.
"""

from __future__ import annotations

from collections import defaultdict, deque


def _build_adj(src, dst, w):
    adj = defaultdict(dict)
    nodes = set()
    for u, v, wt in zip(src, dst, w):
        u, v, wt = int(u), int(v), float(wt)
        nodes.add(u)
        nodes.add(v)
        if u == v:
            adj[u][u] = adj[u].get(u, 0.0) + wt
        else:
            adj[u][v] = adj[u].get(v, 0.0) + wt
            adj[v][u] = adj[v].get(u, 0.0) + wt
    return adj, sorted(nodes)


def _cpm_delta(gamma, k_new, k_old, a_v, n_new, n_old):
    # custom_leiden.py:262-280 / leiden_kernel.cu:135
    return (k_new - gamma * a_v * n_new) - (k_old - gamma * a_v
                                            * (n_old - a_v))


def _move_nodes_fast(adj, nodes, comm, agg, gamma):
    """Sequential queue local moving (custom_leiden.py:534-599),
    ascending-id initial order."""
    comm_agg = defaultdict(float)
    for v in nodes:
        comm_agg[comm[v]] += agg[v]
    q = deque(nodes)
    in_q = set(nodes)
    moved_any = False
    while q:
        v = q.popleft()
        in_q.discard(v)
        self_w = adj[v].get(v, 0.0)
        kw = defaultdict(float)
        for u, wt in adj[v].items():
            if u != v:
                kw[comm[u]] += wt
        old = comm[v]
        k_old = kw.get(old, 0.0) + self_w
        best, best_delta = None, 0.0
        for c in sorted(kw):
            if c == old:
                continue
            delta = _cpm_delta(gamma, kw[c] + self_w, k_old, agg[v],
                               comm_agg[c], comm_agg[old])
            if delta > best_delta + 1e-15:
                best, best_delta = c, delta
        if best is None:
            continue
        comm_agg[old] -= agg[v]
        comm_agg[best] += agg[v]
        comm[v] = best
        moved_any = True
        # §7.4 determinization: re-enqueue in ascending id order (the
        # reference appends in adj-dict insertion order)
        for u in sorted(adj[v]):
            if u != v and comm[u] != best and u not in in_q:
                q.append(u)
                in_q.add(u)
    return comm, moved_any


def _refine(adj, nodes, p_comm, agg, gamma):
    """refine_partition + merge_nodes_subset (custom_leiden.py:350-485):
    singleton reset, per-subset sequential greedy merge, ascending ids."""
    refined = {v: v for v in nodes}
    members = {v: {v} for v in nodes}
    cagg = {v: float(agg[v]) for v in nodes}

    subsets = defaultdict(list)
    for v in nodes:
        subsets[p_comm[v]].append(v)

    for q in sorted(subsets):
        sub = sorted(subsets[q])
        if len(sub) < 2:
            continue
        inset = set(sub)
        S_tot = sum(agg[v] for v in sub)
        # within-subset adjacency (self-loops separate)
        v_in = {}
        for v in sub:
            v_in[v] = sum(wt for u, wt in adj[v].items()
                          if u != v and u in inset)
        # refined-community graph within the subset
        ce = defaultdict(lambda: defaultdict(float))
        for v in sub:
            for u, wt in adj[v].items():
                if u in inset:
                    ce[v][u] += wt
        remaining = set(sub)

        def c_in(c):
            return sum(wt for c2, wt in ce[c].items()
                       if c2 != c and c2 in remaining)

        R = [v for v in sub
             if v_in[v] >= gamma * agg[v] * (S_tot - agg[v])]
        for v in R:
            cur = refined[v]
            if len(members[cur]) != 1:
                continue  # singleton-only moves (custom_leiden.py:393-394)
            T = [c for c in sorted(remaining)
                 if c_in(c) >= gamma * cagg[c] * (S_tot - cagg[c])]
            if not T:
                continue
            self_w = adj[v].get(v, 0.0)
            kw = defaultdict(float)
            for u, wt in adj[v].items():
                if u != v and u in inset:
                    kw[refined[u]] += wt
            k_old = self_w  # singleton: only the self-loop is in-comm
            best, best_delta = None, 0.0
            for c in T:
                if c == cur:
                    continue
                delta = _cpm_delta(gamma, kw.get(c, 0.0) + self_w, k_old,
                                   agg[v], cagg[c], cagg[cur])
                if delta > best_delta + 1e-15:
                    best, best_delta = c, delta
            if best is None:
                continue
            members[cur].discard(v)
            members[best].add(v)
            cagg[best] += agg[v]
            refined[v] = best
            remaining.discard(cur)
            for u, wt in adj[v].items():
                if u in inset and u != v:
                    cu = refined[u]
                    ce[best][cu] += wt
                    if cu != best:
                        ce[cu][best] += wt
            if self_w:
                ce[best][best] += self_w
    return refined


def _aggregate(adj, nodes, refined, agg):
    """aggregate_graph (custom_leiden.py:611-637): coarse weighted graph
    over refined communities; internal weight once per undirected edge."""
    coarse_adj = defaultdict(dict)
    coarse_nodes = sorted(set(refined[v] for v in nodes))
    seen_pairs = set()
    for v in nodes:
        cv = refined[v]
        for u, wt in adj[v].items():
            if (u, v) in seen_pairs or (v, u) in seen_pairs:
                continue
            seen_pairs.add((v, u))
            cu = refined[u]
            if cv == cu:
                coarse_adj[cv][cv] = coarse_adj[cv].get(cv, 0.0) + wt
            else:
                coarse_adj[cv][cu] = coarse_adj[cv].get(cu, 0.0) + wt
                coarse_adj[cu][cv] = coarse_adj[cu].get(cv, 0.0) + wt
    coarse_agg = defaultdict(float)
    for v in nodes:
        coarse_agg[refined[v]] += agg[v]
    return coarse_adj, coarse_nodes, dict(coarse_agg)


def ref_leiden(src, dst, w, gamma, max_levels=20):
    """→ dict vertex → final community (root-level labels)."""
    adj, nodes = _build_adj(src, dst, w)
    agg = {v: 1.0 for v in nodes}
    comm = {v: v for v in nodes}
    level_maps = []
    root_nodes = list(nodes)

    for _level in range(max_levels):
        comm, _ = _move_nodes_fast(adj, nodes, comm, agg, gamma)
        n_comms = len(set(comm.values()))
        if n_comms == len(nodes):
            break
        refined = _refine(adj, nodes, comm, agg, gamma)
        # maintain_p: each refined community inherits its members' p-comm
        p_of_refined = {}
        for v in nodes:
            p_of_refined[refined[v]] = comm[v]
        level_maps.append(dict(refined))
        prev_n = len(nodes)
        adj, nodes, agg = _aggregate(adj, nodes, refined, agg)
        comm = {c: p_of_refined[c] for c in nodes}
        if len(nodes) == prev_n:
            break  # refinement merged nothing: no further coarsening

    final = {}
    for v in root_nodes:
        c = v
        for lm in level_maps:
            c = lm[c]
        # the last level's community assignment
        final[v] = comm.get(c, c)
    return final


def ref_louvain(src, dst, w, max_levels=20):
    """Modularity Louvain (custom_louvain.py:234-374): full ascending-id
    sweeps to zero moves, aggregate, repeat. → vertex → community."""
    adj, nodes = _build_adj(src, dst, w)
    m = sum(wt for v in adj for u, wt in adj[v].items()
            if u >= v) if adj else 0.0
    # degrees count self-loops once; m counts each undirected edge once
    root_nodes = list(nodes)
    level_maps = []
    comm = {v: v for v in nodes}

    for _level in range(max_levels):
        deg = {v: sum(adj[v].values()) for v in nodes}
        tot = defaultdict(float)
        for v in nodes:
            tot[comm[v]] += deg[v]
        moved_total = 0
        while True:
            moved = 0
            for v in sorted(nodes):
                self_w = adj[v].get(v, 0.0)
                kw = defaultdict(float)
                for u, wt in adj[v].items():
                    if u != v:
                        kw[comm[u]] += wt
                old = comm[v]
                k_old = kw.get(old, 0.0) + self_w
                best, best_delta = None, 0.0
                for c in sorted(kw):
                    if c == old:
                        continue
                    k_new = kw[c] + self_w
                    delta = ((k_new - k_old) / m
                             + deg[v] * (tot[old] - tot[c] - deg[v])
                             / (2.0 * m * m))
                    if delta > best_delta + 1e-15:
                        best, best_delta = c, delta
                if best is not None:
                    tot[old] -= deg[v]
                    tot[best] += deg[v]
                    comm[v] = best
                    moved += 1
            moved_total += moved
            if moved == 0:
                break
        n_comms = len(set(comm.values()))
        if n_comms == len(nodes):
            break
        level_maps.append(dict(comm))
        adj, nodes, _ = _aggregate(adj, nodes, comm, {v: 1.0
                                                      for v in nodes})
        comm = {v: v for v in nodes}

    final = {}
    for v in root_nodes:
        c = v
        for lm in level_maps:
            c = lm[c]
        final[v] = c
    return final
