"""Mapping-plan DAG builder.

Parity target: the reference's ``plangenerator`` crate
(`/root/reference/plangenerator/src/plan.rs`):

- type-state builder Init → Processed → Serialized → Sunk
  (plan.rs:31-37 unit structs; here enforced at runtime),
- ``source`` (plan.rs:218-233), ``apply`` with a Source/Fragment/Target/
  Serializer blacklist (plan.rs:249-257), ``fragment`` (plan.rs:284-313)
  with fragment-consistency validation (plan.rs:101-123),
- binary-join DSL ``join(left, right).alias(a).where_by(child)
  .compared_to(parent)`` / ``.natural_join()`` / ``.cross_join()``
  (plan.rs:350-539),
- ``serialize`` (plan.rs:342-347) and ``sink`` (plan.rs:542-564),
- node ids ``"{Prefix}_{count}"`` (plan.rs:259-263) and JSON shape
  ``{"id", "operator": {"type": ...}}`` (plan.rs:598-603).

The DAG itself is a tiny adjacency-list graph (no external deps); the
Spark binder in ``kgloom.exec.binder`` walks it topologically.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field
from typing import Optional

from .algebra import (
    NON_APPLY_OPERATORS,
    FragmentOp,
    JoinOp,
    JoinType,
    Operator,
    PredicateType,
    SerializerOp,
    SourceOp,
    TargetOp,
)

DEFAULT_FRAGMENT = "default"


class PlanError(Exception):
    pass


@dataclass
class PlanNode:
    """plangenerator/src/plan.rs:592-596."""

    id: str
    operator: Operator


@dataclass
class PlanEdge:
    """plangenerator/src/plan.rs:567-570 — edge labeled with fragment name."""

    src: str
    dst: str
    fragment: str = DEFAULT_FRAGMENT


@dataclass
class PlanGraph:
    """Shared mutable DAG; Plan handles point at nodes within it."""

    nodes: dict[str, PlanNode] = dc_field(default_factory=dict)
    edges: list[PlanEdge] = dc_field(default_factory=list)
    node_count: int = 0

    def add_node(self, operator: Operator, prefix: str) -> str:
        node_id = f"{prefix}_{self.node_count}"
        self.nodes[node_id] = PlanNode(id=node_id, operator=operator)
        self.node_count += 1
        return node_id

    def add_edge(self, src: str, dst: str, fragment: str = DEFAULT_FRAGMENT) -> None:
        self.edges.append(PlanEdge(src=src, dst=dst, fragment=fragment))

    def predecessors(self, node_id: str) -> list[PlanEdge]:
        return [e for e in self.edges if e.dst == node_id]

    def successors(self, node_id: str) -> list[PlanEdge]:
        return [e for e in self.edges if e.src == node_id]

    def topological_order(self) -> list[str]:
        indeg = {n: 0 for n in self.nodes}
        for e in self.edges:
            indeg[e.dst] += 1
        ready = sorted(n for n, d in indeg.items() if d == 0)
        out: list[str] = []
        while ready:
            n = ready.pop(0)
            out.append(n)
            for e in self.successors(n):
                indeg[e.dst] -= 1
                if indeg[e.dst] == 0:
                    ready.append(e.dst)
            ready.sort()
        if len(out) != len(self.nodes):
            raise PlanError("plan graph has a cycle")
        return out

    # -- serialization -----------------------------------------------------
    def to_json(self) -> dict:
        return {
            "nodes": [{"id": n.id, "operator": n.operator.to_json()}
                      for n in self.nodes.values()],
            "edges": [{"from": e.src, "to": e.dst, "fragment": e.fragment}
                      for e in self.edges],
        }

    def to_json_string(self, **kw) -> str:
        return json.dumps(self.to_json(), indent=2, **kw)

    @staticmethod
    def from_json(data: dict) -> "PlanGraph":
        """Inverse of :meth:`to_json` — plans are data in both
        directions (the reference derives serde Deserialize too,
        operator/src/lib.rs:18-19), so an emitted ``<stem>.json`` plan
        binds and executes without its mapping document."""
        from .algebra import operator_from_json
        g = PlanGraph()
        for n in data.get("nodes", []):
            g.nodes[n["id"]] = PlanNode(
                id=n["id"], operator=operator_from_json(n["operator"]))
        for e in data.get("edges", []):
            g.edges.append(PlanEdge(src=e["from"], dst=e["to"],
                                    fragment=e.get("fragment",
                                                   DEFAULT_FRAGMENT)))
        g.node_count = len(g.nodes)
        return g

    @staticmethod
    def from_json_string(text: str) -> "PlanGraph":
        return PlanGraph.from_json(json.loads(text))

    def to_dot(self, pretty: bool = False) -> str:
        """Graphviz rendering.  ``pretty`` adds a per-node config digest
        (the reference emits both: plan.rs:190-199 write/write_pretty —
        Debug vs Display formatting of the operator)."""
        lines = ["digraph {"]
        if pretty:
            lines.append('  node [shape=box, fontname="monospace"];')
        for n in self.nodes.values():
            label = n.operator.to_json()["type"]
            if pretty:
                digest = self._pretty_digest(n.operator.to_json())
                if digest:
                    label += "\\n" + digest
            lines.append(f'  "{n.id}" [label="{n.id}\\n{label}"];')
        for e in self.edges:
            lines.append(f'  "{e.src}" -> "{e.dst}" [label="{e.fragment}"];')
        lines.append("}")
        return "\n".join(lines)

    @staticmethod
    def _pretty_digest(op_json: dict) -> str:
        """Short human-readable config summary per operator kind."""
        def esc(s: str) -> str:
            return str(s).replace('"', '\\"').replace("\n", "\\n")

        t = op_json.get("type")
        cfg = op_json.get("config", {})
        if t == "SourceOp":
            src = cfg.get("config", {}).get("source", "")
            rf = cfg.get("root_iterator", {}).get("reference_formulation", "")
            return esc(f"{rf}: {src}")[:80]
        if t == "ProjectOp":
            attrs = sorted(cfg.get("projection_attributes", []))
            return esc(", ".join(attrs))[:80]
        if t == "RenameOp":
            pairs = cfg.get("rename_pairs", {})
            return esc(", ".join(f"{a}→{b}" for a, b in
                                 sorted(pairs.items()) if a != b))[:80]
        if t == "ExtendOp":
            return esc(", ".join(sorted(cfg.get("extend_pairs", {}))))[:80]
        if t == "JoinOp":
            pairs = cfg.get("left_right_attr_pairs", [])
            cond = ", ".join(f"{a}={b}" for a, b in pairs)
            return esc(f"{cfg.get('join_type', '')} {cond}")[:80]
        if t == "SerializerOp":
            n_lines = len([ln for ln in
                           cfg.get("template", "").splitlines() if ln.strip()])
            return esc(f"{cfg.get('format', '')} ×{n_lines} lines")
        if t == "TargetOp":
            return esc(f"{cfg.get('target_type', '')} "
                       f"{cfg.get('configuration', {}).get('path', '')}")[:80]
        return ""


STATE_INIT = "Init"
STATE_PROCESSED = "Processed"
STATE_SERIALIZED = "Serialized"
STATE_SUNK = "Sunk"


class Plan:
    """A handle onto a node of the shared PlanGraph, with a type-state tag.

    Mirrors plangenerator/src/plan.rs:50-60 (new), 218-233 (source),
    249-282 (apply), 284-313 (fragment), 342-347 (serialize),
    542-564 (sink).
    """

    def __init__(self, graph: Optional[PlanGraph] = None,
                 node_id: Optional[str] = None, state: str = STATE_INIT,
                 fragment: str = DEFAULT_FRAGMENT):
        self.graph = graph if graph is not None else PlanGraph()
        self.node_id = node_id
        self.state = state
        self.frag = fragment

    def _check(self, expected: str) -> None:
        if self.state != expected:
            raise PlanError(
                f"operation requires plan state {expected}, got {self.state}")

    def _derive(self, node_id: str, state: str, fragment: Optional[str] = None) -> "Plan":
        return Plan(self.graph, node_id, state,
                    fragment if fragment is not None else self.frag)

    # -- builder steps -----------------------------------------------------
    def source(self, source: SourceOp) -> "Plan":
        """plan.rs:218-233 — only valid on an Init plan."""
        self._check(STATE_INIT)
        node_id = self.graph.add_node(source, "Source")
        return self._derive(node_id, STATE_PROCESSED)

    def apply(self, operator: Operator, prefix: str) -> "Plan":
        """plan.rs:249-282 — apply a non-source/sink/fragment operator."""
        self._check(STATE_PROCESSED)
        if isinstance(operator, NON_APPLY_OPERATORS):
            raise PlanError(
                f"cannot apply() a {type(operator).__name__}; use the dedicated method")
        node_id = self.graph.add_node(operator, prefix)
        self.graph.add_edge(self.node_id, node_id, self.frag)
        return self._derive(node_id, STATE_PROCESSED)

    def fragment(self, fragmenter: FragmentOp) -> "Plan":
        """plan.rs:284-313 — split into named fragments.

        Consistency check (plan.rs:101-123): the fragmenter's ``from``
        must match the current fragment string.
        """
        self._check(STATE_PROCESSED)
        if fragmenter.from_fragment != self.frag:
            raise PlanError(
                f"fragmenter.from={fragmenter.from_fragment!r} does not match "
                f"current fragment {self.frag!r}")
        node_id = self.graph.add_node(fragmenter, "Fragment")
        self.graph.add_edge(self.node_id, node_id, self.frag)
        return self._derive(node_id, STATE_PROCESSED)

    def with_fragment(self, fragment: str) -> "Plan":
        """Select the named output fragment of a FragmentOp node."""
        node = self.graph.nodes[self.node_id]
        if isinstance(node.operator, FragmentOp) and \
                fragment not in node.operator.to_fragments:
            raise PlanError(f"fragment {fragment!r} not produced by {self.node_id}")
        return self._derive(self.node_id, self.state, fragment)

    def serialize(self, serializer: SerializerOp) -> "Plan":
        """plan.rs:342-347."""
        self._check(STATE_PROCESSED)
        node_id = self.graph.add_node(serializer, "Serialize")
        self.graph.add_edge(self.node_id, node_id, self.frag)
        return self._derive(node_id, STATE_SERIALIZED, DEFAULT_FRAGMENT)

    def sink(self, target: TargetOp) -> "Plan":
        """plan.rs:542-564."""
        self._check(STATE_SERIALIZED)
        node_id = self.graph.add_node(target, "Sink")
        self.graph.add_edge(self.node_id, node_id, self.frag)
        return self._derive(node_id, STATE_SUNK)


class JoinBuilder:
    """Binary-join DSL (plangenerator/src/plan.rs:350-539).

    ``join(left, right).alias(a).where_by([child]).compared_to([parent])``
    builds an inner equi-join; ``natural_join()`` / ``cross_join()`` build
    the other flavors the reference translator emits
    (translator/src/rmlalgebra/mod.rs:249-261).
    """

    def __init__(self, left: Plan, right: Plan):
        left._check(STATE_PROCESSED)
        right._check(STATE_PROCESSED)
        if left.graph is not right.graph:
            raise PlanError("join operands must share one plan graph")
        self.left = left
        self.right = right
        self._alias = ""
        self._child_attrs: Optional[list[str]] = None

    def alias(self, alias: str) -> "JoinBuilder":
        self._alias = alias
        return self

    def where_by(self, child_attributes: list[str]) -> "JoinBuilder":
        self._child_attrs = list(child_attributes)
        return self

    def compared_to(self, parent_attributes: list[str]) -> Plan:
        if self._child_attrs is None:
            raise PlanError("where_by() must precede compared_to()")
        if len(self._child_attrs) != len(parent_attributes):
            raise PlanError("child/parent attribute lists differ in length")
        pairs = tuple(zip(self._child_attrs, parent_attributes))
        return self._emit(JoinOp(left_right_attr_pairs=pairs,
                                 join_type=JoinType.INNER,
                                 predicate_type=PredicateType.EQ,
                                 join_alias=self._alias))

    def natural_join(self) -> Plan:
        return self._emit(JoinOp(left_right_attr_pairs=(),
                                 join_type=JoinType.NATURAL,
                                 join_alias=self._alias))

    def cross_join(self) -> Plan:
        return self._emit(JoinOp(left_right_attr_pairs=(),
                                 join_type=JoinType.CROSS,
                                 join_alias=self._alias))

    def theta_join(self, pairs: list[tuple[str, str]],
                   predicate: PredicateType,
                   join_type: JoinType = JoinType.INNER) -> Plan:
        """IR-complete theta joins (the reference defines them in the IR —
        operator/src/lib.rs:148-154 — but its translator never emits them;
        we support execution for all of them)."""
        return self._emit(JoinOp(left_right_attr_pairs=tuple(pairs),
                                 join_type=join_type,
                                 predicate_type=predicate,
                                 join_alias=self._alias))

    def _emit(self, op: JoinOp) -> Plan:
        g = self.left.graph
        node_id = g.add_node(op, "Join")
        # Edge order is meaningful: first predecessor = left/child input,
        # second = right/parent input (binder relies on it).
        g.add_edge(self.left.node_id, node_id, self.left.frag)
        g.add_edge(self.right.node_id, node_id, self.right.frag)
        return Plan(g, node_id, STATE_PROCESSED, DEFAULT_FRAGMENT)


def join(left: Plan, right: Plan) -> JoinBuilder:
    return JoinBuilder(left, right)
