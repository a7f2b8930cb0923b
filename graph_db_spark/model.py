"""Schema layer: typed vertex kinds, edge kinds, and write-time index emission.

Reference parity:
- ``Edge v v'`` instances with ``indexes :: v' -> [Index v v']``
  (/root/reference/library/GraphDB/Model.hs:36-39) become ``EdgeKind``
  records carrying a list of ``IndexSpec`` — each an *expression* over the
  joined (src-vertex, dst-vertex) row that emits zero or more
  ``(idx_tag, idx_key)`` pairs per edge.
- The Template-Haskell union codegen (library/GraphDB/Macros/Templates.hs:41-68)
  becomes: one ``kind`` discriminator column on ``vertices``; payload columns
  are plain typed columns shared across kinds (NULL where inapplicable).
  Catalyst whole-stage codegen replaces compile-time dispatch.

Index emission is evaluated with Spark built-in expressions (JVM-side,
codegen'd) — never row-at-a-time Python. An exploding spec (e.g. the
search-term tokenizer of executables/Demo.hs:28, ``Text.words name``)
returns an ARRAY expression that the engine explodes into one
``edge_index`` row per element.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class IndexSpec:
    """One index family emitted for an edge kind.

    ``key_expr`` is a Spark SQL expression string evaluated over a row with:
      - dst-vertex payload columns under their plain names (``name``, ...)
      - src-vertex payload columns prefixed ``src_`` (``src_name``, ...)
      - ``src``/``dst`` ids.
    ``None`` → a bare type-marker index (key is NULL), e.g. ``Catalogue_Artist``
    (reference: executables/APITests/Catalogue.hs:40).
    ``explode=True`` → ``key_expr`` must yield ARRAY<STRING>; one row per
    element, e.g. search terms (executables/Demo.hs:19-28).
    """

    tag: str
    key_expr: str | None = None
    explode: bool = False


@dataclass(frozen=True)
class VertexKind:
    """A node-payload variant of the closed value union (Templates.hs:52-54)."""

    name: str
    payload_cols: tuple = ()  # subset of the vertices schema this kind uses


@dataclass(frozen=True)
class EdgeKind:
    """An ``Edge src dst`` instance (Model.hs:36-39) with its index emission."""

    src_kind: str
    dst_kind: str
    indexes: tuple = field(default_factory=tuple)  # tuple[IndexSpec, ...]


@dataclass(frozen=True)
class GraphSchema:
    """The generated ``Setup`` of the reference (Macros.hs:14-32): the closed
    set of vertex kinds + edge kinds, with index-emission dispatch by
    (src_kind, dst_kind) — the Spark analogue of the generated
    ``indexes :: Value -> Value -> [Index]`` clauses (Templates.hs:77-88)."""

    vertex_kinds: tuple
    edge_kinds: tuple

    def edge_kind(self, src_kind: str, dst_kind: str) -> EdgeKind | None:
        for ek in self.edge_kinds:
            if ek.src_kind == src_kind and ek.dst_kind == dst_kind:
                return ek
        return None


ROOT_ID = 0  # the distinguished root node (GraphDB.hs:318-319)
