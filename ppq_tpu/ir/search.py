"""Graph pattern/search engine (redesign of ppq/IR/search.py:28-690).

Three query families, all lambda-driven:

  * path_matching    — enumerate op paths sp → ... → ep where every hop
                       satisfies rp (relay predicate); forward or backward.
  * opset_matching   — flood-fill the set of ops reachable from sp through
                       rp, stopping at ep; returns an OperationSet.
  * pattern_matching — match a linear chain of type/predicate patterns
                       (the workhorse of fusion passes), optionally
                       'exclusive': interior ops must have a single consumer.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Set, Union

from .graph import BaseGraph, Operation

OpPredicate = Callable[[Operation], bool]
Pattern = Union[str, Sequence[str], OpPredicate]


class Path(list):
    """An ordered op chain."""

    def __repr__(self):
        return ' -> '.join(op.name for op in self)


class OperationSet(set):
    def filter(self, predicate: OpPredicate) -> 'OperationSet':
        return OperationSet(op for op in self if predicate(op))


def _as_predicate(pattern: Pattern) -> OpPredicate:
    if callable(pattern):
        return pattern
    if isinstance(pattern, str):
        return lambda op, t=pattern: op.type == t
    types = set(pattern)
    return lambda op, ts=types: op.type in ts


class SearchableGraph:
    """Query helper bound to a BaseGraph (ppq/IR/search.py:390)."""

    def __init__(self, graph: BaseGraph):
        self.graph = graph

    # ------------------------------------------------------------ traversal
    def _next(self, op: Operation, direction: str) -> List[Operation]:
        if direction == 'down':
            return self.graph.get_downstream_operations(op)
        return self.graph.get_upstream_operations(op)

    def path_matching(self, sp_expr: Pattern, rp_expr: Pattern,
                      ep_expr: Pattern, direction: str = 'down',
                      max_depth: int = 64) -> List[Path]:
        """All paths sp →(rp)*→ ep (ppq/IR/search.py:506)."""
        sp, rp, ep = map(_as_predicate, (sp_expr, rp_expr, ep_expr))
        results: List[Path] = []
        for op in self.graph.topological_sort():
            if not sp(op):
                continue
            stack: List[Path] = [Path([op])]
            while stack:
                path = stack.pop()
                tail = path[-1]
                for nxt in self._next(tail, direction):
                    if nxt in path:
                        continue
                    if ep(nxt):
                        results.append(Path(path + [nxt]))
                    if rp(nxt) and len(path) < max_depth:
                        stack.append(Path(path + [nxt]))
        return results

    def opset_matching(self, sp_expr: Pattern, rp_expr: Pattern,
                       ep_expr: Optional[Pattern] = None,
                       direction: str = 'down') -> OperationSet:
        """Flood-fill matching (ppq/IR/search.py:564): collect sp ops and
        everything reachable through rp; ep ops terminate expansion (and are
        included)."""
        sp = _as_predicate(sp_expr)
        rp = _as_predicate(rp_expr)
        ep = _as_predicate(ep_expr) if ep_expr is not None else (lambda op: False)
        result = OperationSet()
        frontier = [op for op in self.graph.operations.values() if sp(op)]
        result.update(frontier)
        while frontier:
            op = frontier.pop()
            for nxt in self._next(op, direction):
                if nxt in result:
                    continue
                if ep(nxt):
                    result.add(nxt)
                    continue
                if rp(nxt):
                    result.add(nxt)
                    frontier.append(nxt)
        return result

    # ----------------------------------------------------------- patterns
    def pattern_matching(self, patterns: Sequence[Pattern],
                         edges: Optional[Sequence[Sequence[int]]] = None,
                         exclusive: bool = True) -> List[List[Operation]]:
        """Match a chain (or small DAG) of patterns.

        With default edges, patterns form a linear chain p0→p1→...→pn.
        `exclusive` requires every interior op to have exactly one consumer
        (safe-to-fuse condition, ppq/IR/search.py:655).
        """
        preds = [_as_predicate(p) for p in patterns]
        n = len(preds)
        if edges is None:
            edges = [[i, i + 1] for i in range(n - 1)]
        adj: List[List[int]] = [[] for _ in range(n)]
        for a, b in edges:
            adj[a].append(b)
        results: List[List[Operation]] = []

        def extend(assign: List[Optional[Operation]], idx: int):
            if idx == n:
                results.append(list(assign))  # type: ignore[arg-type]
                return
            # find candidates: ops downstream of all already-assigned parents
            parents = [i for i in range(idx) if idx in adj[i]]
            if parents:
                cands: Optional[Set[Operation]] = None
                for p in parents:
                    downs = set(self.graph.get_downstream_operations(assign[p]))
                    cands = downs if cands is None else (cands & downs)
                candidates = list(cands or [])
            else:
                candidates = list(self.graph.operations.values())
            for op in candidates:
                if op in assign:
                    continue
                if not preds[idx](op):
                    continue
                if exclusive and parents:
                    ok = True
                    for p in parents:
                        src = assign[p]
                        if len(self.graph.get_downstream_operations(src)) != 1:
                            ok = False
                            break
                    if not ok:
                        continue
                assign.append(op)
                extend(assign, idx + 1)
                assign.pop()

        for op in self.graph.topological_sort():
            if preds[0](op):
                extend([op], 1)
        # de-dup (chains found once per root)
        seen, uniq = set(), []
        for r in results:
            key = tuple(o.name for o in r)
            if key not in seen:
                seen.add(key)
                uniq.append(r)
        return uniq

    def activation_matching(self, start_op_types: Set[str],
                            end_types: Set[str]) -> dict:
        """computing-op → its direct activation op (ppq/IR/search.py:621)."""
        matches = {}
        for op in self.graph.operations.values():
            if op.type not in start_op_types:
                continue
            downs = self.graph.get_downstream_operations(op)
            if len(downs) == 1 and downs[0].type in end_types:
                matches[op.name] = downs[0]
        return matches

    def concat_matching(self, relay_pattern: Pattern,
                        end_pattern: Pattern) -> dict:
        """For each Concat, trace its input sources back through relay ops
        (ppq/IR/search.py:639)."""
        relay, end = _as_predicate(relay_pattern), _as_predicate(end_pattern)
        result = {}
        for op in self.graph.operations.values():
            if op.type != 'Concat':
                continue
            sources = []
            for up in self.graph.get_upstream_operations(op):
                node = up
                depth = 0
                while relay(node) and depth < 32:
                    ups = self.graph.get_upstream_operations(node)
                    if len(ups) != 1:
                        break
                    node = ups[0]
                    depth += 1
                if end(node):
                    sources.append(node)
            result[op.name] = sources
        return result
