"""Typed AST for GQL statements.

Mirrors the statement surface of the reference grammar (``src/gql.y``):
create/upset/query/remove/drop/dump/show/ast/profile/import, where-clause
predicate objects, edge patterns and walk declarations, and lambda
expressions.  The AST is plain dataclasses — the planner lowers it to
PySpark DataFrame expressions.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional


# ---------------------------------------------------------------- literals

@dataclass(frozen=True)
class DatetimeLit:
    """``0d<epoch-seconds>`` literal (src/gql.l:80-87)."""
    epoch: float


@dataclass(frozen=True)
class BinaryLit:
    """``0b'BASE64'`` literal (src/gql.l:72-79)."""
    data: bytes


@dataclass(frozen=True)
class GeohashLit:
    """``0h'hash'`` literal (README.md:139)."""
    hash: str


class Wildcard:
    """``*`` — attribute-exists predicate / pattern wildcard."""

    _inst: Optional["Wildcard"] = None

    def __new__(cls) -> "Wildcard":
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self) -> str:
        return "*"


STAR = Wildcard()


@dataclass(frozen=True)
class Lambda:
    """``(args) => { body }`` (src/gql.y:935-939). Body kept as parsed
    statement list; compiled to a Python callable by gvm.py."""
    params: tuple[str, ...]
    body: tuple  # tuple of (kind, ...) statements from the lambda mini-parser
    source: str = ""


@dataclass(frozen=True)
class CallExpr:
    """``count(vertex)`` / ``min('distance')`` (src/gql.y:919-934)."""
    func: str
    args: tuple[Any, ...] = ()


@dataclass(frozen=True)
class MemberRef:
    """``movie.title`` projection reference (src/gql.y:495-539)."""
    group: str
    prop: str


# ---------------------------------------------------------------- predicates

@dataclass
class Pred:
    """A single predicate on one attribute.

    op ∈ {eq, in, exists, lt, gt, lte, gte, near, lambda, and, or}.
    ``near`` value is a dict {'geometry': [...], 'limit': k|None,
    'lte'/'lt': radius|None} (squared-L2 semantics, Distance.cpp:133-157).
    """
    attr: Optional[str]
    op: str
    value: Any = None
    children: list["Pred"] = field(default_factory=list)


# ------------------------------------------------------------- walk patterns

@dataclass
class EdgeConn:
    """Connection in a pattern: direction ∈ {'->','<-','--'}; optional edge
    group name / property filter / path aggregate (min())."""
    direction: str
    edge_group: Optional[str] = None
    props: Optional[dict] = None
    agg: Optional[CallExpr] = None


@dataclass
class PatternNode:
    """Endpoint in an edge/walk pattern: a key literal, * wildcard, or a
    property-condition object."""
    key: Any = None           # literal key or None
    wildcard: bool = False
    conds: Optional[dict] = None  # raw property conditions


@dataclass
class WalkPattern:
    """[v1, conn, v2, conn, v3, ...] — nodes and connections interleaved."""
    nodes: list[PatternNode]
    conns: list[EdgeConn]


# ---------------------------------------------------------------- statements

@dataclass
class GroupDef:
    name: str
    props: list[str] = field(default_factory=list)
    index: list[str] = field(default_factory=list)
    is_edge: bool = False
    src_group: Optional[str] = None
    dst_group: Optional[str] = None


@dataclass
class CreateStmt:
    graph: str
    groups: list[GroupDef] = field(default_factory=list)


@dataclass
class UpsetVertexStmt:
    group: str
    vertices: list[tuple]  # (key, props|None)


@dataclass
class UpsetEdgeStmt:
    group: str
    edges: list[tuple]  # (src_key, direction, dst_key, props|None)


@dataclass
class UpsetPropertyStmt:
    group: str
    props: dict
    where: Any  # Pred tree or WalkPattern


@dataclass
class QueryStmt:
    target: Any            # group name | [MemberRef,...] | CallExpr | '*'
    graph: Optional[str] = None
    where: Any = None      # Pred | WalkPattern | None
    from_key: Any = None   # neighbor-query start key (README.md:244-246)


@dataclass
class InferStmt:
    """README.md:252-268 inference surface ({query:, event:, where: edge
    triples}) — declared by the reference with zero implementing LoC."""
    hidden: str            # hidden-variable group name
    events: list           # [{event_name: observed_symbol}, ...] in order
    edges: list            # raw [src, {'->': weight}, dst] triples


@dataclass
class DedupStmt:
    """``{dedup: group, in: g, method: m, on: prop, threshold: t}`` —
    engine-level surface over the training-data dedup operators (beyond
    the reference, which has no dedup statement; the engine analogue of
    the library operators in operators/dedup.py)."""
    group: str
    graph: Optional[str] = None
    method: str = "exact"   # exact|minhash|jaccard|simhash|lines|clusters|embedding
    on: Optional[str] = None
    threshold: float = 0.8
    # method 'clusters' only: pick each cluster's survivor by the MAX
    # of this numeric property (tie -> min id) instead of the min-id
    # canonical — operators/dedup.py::keep_best_per_cluster
    best_by: Optional[str] = None


@dataclass
class SimilarStmt:
    """``{similar: group, in: g, to: [vec], top: k, on: prop,
    method: m}`` — ANN/top-k vector search over a group's vector
    property (engine analogue of operators/similarity.py; the
    reference's closest surface is the HNSW $near query).

    JOIN form (r8): ``queries: 'other_group'`` replaces ``to`` — EVERY
    vector in that group searches the corpus group (top-k each).
    ``method: 'brute'`` broadcasts the query side
    (similarity.knn_join); ``method: 'ivf'`` runs the distributed IVF
    join (ivf_knn_join / ivf_knn_join_indexed when ``index:`` is
    given) — no broadcast of either side.  ``qon``/``nlist``/``nprobe``
    apply to the join form only."""
    group: str
    to: Optional[list]
    graph: Optional[str] = None
    top: int = 10
    on: str = "embedding"
    method: str = "brute"   # brute|lsh|ivf|pq
    index: Optional[str] = None  # persisted-index dir (lsh/ivf/pq)
    queries: Optional[str] = None  # join form: query-side group
    qon: Optional[str] = None      # its vector property (default: on)
    nlist: Optional[int] = None
    nprobe: Optional[int] = None


@dataclass
class ChunkStmt:
    """``{chunk: group, in: g, on: prop, size: n, overlap: m}`` —
    document chunking as an engine statement (operators/text.py
    chunk_documents)."""
    group: str
    graph: Optional[str] = None
    on: str = "text"
    size: int = 64
    overlap: int = 8


@dataclass
class FunnelStmt:
    """``{funnel: group, in: g, steps: [a, b, ...], by: user_prop,
    on: type_prop, ts: ts_prop, within: micros}`` — ordered conversion
    funnel as an engine statement (operators/temporal.py funnel: k
    filtered keyed aggregates, no window over raw events)."""
    group: str
    steps: list
    graph: Optional[str] = None
    by: str = "user_id"
    on: str = "event_type"
    ts: str = "ts"
    within: Optional[int] = None


@dataclass
class CohortStmt:
    """``{cohort: group, in: g, by: user_prop, ts: ts_prop,
    bucket: seconds}`` — cohort retention matrix as an engine statement
    (operators/temporal.py cohort_retention)."""
    group: str
    graph: Optional[str] = None
    by: str = "user_id"
    ts: str = "ts"
    bucket: int = 86400


@dataclass
class SampleStmt:
    """``{sample: group, in: g, rate: r}`` (hash sample) or
    ``{sample: group, in: g, by: prop, rates: {v: r, ...}, default: r}``
    (stratified) or ``{sample: group, in: g, clusters: n, per: k,
    on: prop}`` (embedding-cluster-balanced) — deterministic md5-keyed
    sampling as an engine statement (operators/sampling.py: scan-only
    predicate for rate/rates; one cluster_id shuffle for clusters)."""
    group: str
    graph: Optional[str] = None
    rate: Optional[float] = None
    by: Optional[str] = None
    rates: Optional[dict] = None
    default: float = 0.0
    salt: str = ""
    clusters: Optional[int] = None
    per: int = 1
    on: str = "embedding"


@dataclass
class SplitStmt:
    """``{split: group, in: g, weights: {train: 0.8, val: 0.1,
    test: 0.1}, by: prop, salt: s}`` — deterministic leakage-safe
    train/val/test assignment as an engine statement
    (operators/sampling.split_assign): cumulative md5(salt||key)
    thresholds; ``by:`` names the co-travel key (source/domain/
    cluster-rep) so correlated rows land in the same split — default
    is the group key.  Weights default to 80/10/10."""
    group: str
    graph: Optional[str] = None
    weights: Optional[dict] = None
    by: Optional[str] = None
    salt: str = ""


@dataclass
class BudgetStmt:
    """``{budget: group, in: g, tokens: n, by: prop, on: prop}`` —
    quality-first selection under a token budget as an engine statement
    (operators/sampling.select_token_budget): rows in (``by`` DESC, key
    ASC) order while the running sum of ``on`` stays ≤ ``tokens``;
    computed via the bounded histogram-threshold decomposition, never a
    corpus-wide single-partition cumsum."""
    group: str
    tokens: int
    graph: Optional[str] = None
    by: str = "quality"
    on: str = "n_tokens"


@dataclass
class RetrieveStmt:
    """``{retrieve: group, in: g, terms: [...], top: k, on: prop,
    k1: x, b: y}`` — BM25 top-k lexical retrieval as an engine
    statement (operators/text.bm25_topk): integer micro-nat idf,
    quantized order-independent per-document scores, rank filter
    lowered to a distributed top-k.  With ``near:`` (a query vector)
    and ``vectors:`` (the embedding group whose key aligns with the
    document group's), the statement runs HYBRID retrieval instead
    (operators/similarity.hybrid_topk): dense cosine top-k_each fused
    with BM25 top-k_each by reciprocal rank (``fuse:`` = the RRF c
    constant, default 60; ``von:`` = the vector property)."""
    group: str
    terms: "list[str]"
    graph: Optional[str] = None
    top: int = 20
    on: str = "text"
    k1: float = 1.2
    b: float = 0.75
    near: Optional[list] = None
    vectors: Optional[str] = None
    von: str = "embedding"
    fuse: int = 60


@dataclass
class CurateStmt:
    """``{curate: group, in: g, benchmark: bench_group, on: prop,
    quality_min: q, ngram: n, method: m, best_by: prop}`` — the
    one-plan curation pipeline as an engine statement
    (operators/sampling.py::curate_corpus): dedup purge → quality gate
    → word-``ngram`` benchmark decontamination → per-language corpus
    report, three shuffles total.  ``method: 'exact'`` (default)
    purges exact duplicates — min-id canonical, or the max-``best_by``
    member when given; ``method: 'clusters'`` purges NEAR-dup clusters
    to their keep-best survivor (LSH pairs → connected components →
    ``keep_best_per_cluster`` on ``best_by``, default text length).
    Beyond-reference surface: the LLM-pipeline north star, end-to-end
    from GQL."""
    group: str
    benchmark: str
    graph: Optional[str] = None
    on: str = "text"
    quality_min: float = 0.5
    ngram: int = 8
    method: str = "exact"   # exact | clusters
    best_by: Optional[str] = None
    threshold: float = 0.7  # near-dup Jaccard (method 'clusters' only)


@dataclass
class ShardsStmt:
    """``{shards: group, in: g, path: 'dir', n: 8, salt: 'ep1'}`` —
    deterministic epoch-shard export: md5 shard assignment + within-
    shard sort, one file per shard, layout a pure function of
    (salt, id) (operators/sampling.py::write_training_shards).  Result
    rows are the per-shard counts."""
    group: str
    path: str
    graph: Optional[str] = None
    n: int = 32
    salt: str = ""


@dataclass
class LayoutStmt:
    """``{layout: group, in: g, path: 'dir', by: [a, b], files: 64}``
    (sort-clustered export: range layout for one column, z-order for
    several — sources/clustered.py) or ``{layout: group, in: g,
    path: 'dir', bucket_by: key, buckets: 64}`` (hash-bucketed
    co-location — sources/bucketed.py).  The GQL surface of the
    write-once storage layouts: pay one shuffle at export, every later
    scan skips files / every later join skips the exchange.  With
    ``attach: true`` the group's query path is pointed at the copy
    (Group.attach_layout) — combined with by:/bucket_by: it exports
    then attaches; alone it attaches an existing layout at ``path``
    (e.g. in a fresh session).  ``compact: true`` (alone) folds the
    local OLTP overlay into the ALREADY-attached layout
    (Group.compact_into_layout — new ids are hash-/sort-routed into
    the copy incrementally, updates stay in the overlay), so ingest
    never forces a full re-export.  Result rows: (kind, path, n_rows);
    compact returns (rows_folded, rows_kept)."""
    group: str
    path: str
    graph: Optional[str] = None
    by: Optional[list] = None
    files: int = 16
    bucket_by: Optional[str] = None
    buckets: int = 16
    attach: bool = False
    compact: bool = False


@dataclass
class RollupStmt:
    """``{rollup: group, in: g, path: 'dir', ts: 'ts', every: 3600,
    by: ['event_type'], metrics: {value: ['sum', 'min', 'max']}}`` —
    build the incremental time-bucket rollup (continuous aggregate,
    operators/rollup.py) of the group's events; ``{rollup: group,
    path: 'dir', append: true}`` folds the group's rows in as ONE new
    ingest batch (use a staging group per batch — the statement reads
    the group as-is).  Result row: (kind, path, n_buckets)."""
    group: str
    path: str
    graph: Optional[str] = None
    ts: str = "ts"
    every: int = 3600
    by: Optional[list] = None
    metrics: Optional[dict] = None
    append: bool = False
    hist: Optional[dict] = None  # {prop: [lo, hi, bins]} for 'hist' fns
    cms: Optional[dict] = None   # {prop: [d, w]} for 'cms' fns


@dataclass
class TopcountStmt:
    """``{topcount: '<rollup path>', on: 'user', keys: [7, 8]}`` —
    read per-(bucket, dims) count-min ESTIMATES of the literal keys
    from a stored rollup's ``cms`` metric counter maps
    (operators/rollup.py::rollup_keycounts): the incrementally
    maintained "how often did THIS key appear per hour" report, served
    from the bucket table alone — never a rescan of the events.  The
    GQL read surface that makes the CMS sketch first-class like
    kmv/hist (VERDICT r9 next #6).  Result rows: (bucket_start,
    dims..., key, count_est)."""
    path: str
    on: str
    keys: list


@dataclass
class QuantilesStmt:
    """``{quantiles: '<rollup path>', on: 'latency', qs: [0.5, 0.99]}``
    — read per-(bucket, dims) quantile ESTIMATES of a stored rollup's
    ``hist`` metric bin maps (operators/rollup.py::rollup_quantiles,
    error ≤ one bin width): the incrementally maintained per-hour p99
    report, served from the bucket table alone — never a rescan of the
    events.  Makes the histogram sketch first-class from GQL like the
    CMS' ``{topcount:}`` (VERDICT r10 next #5).  Result rows:
    (bucket_start, dims..., q, value)."""
    path: str
    on: str
    qs: list


@dataclass
class ReadRollupStmt:
    """``{rollup: '<rollup path>', read: true, avg: ['value']}`` — read
    a stored rollup's finished view (operators/rollup.py::read_rollup):
    buckets + maintained metrics, each ``kmv`` metric served as a
    ``distinct_<col>`` estimate column and ``avg:`` deriving
    ``avg_<col>`` = sum/count.  The read half of the rollup lifecycle
    from GQL — together with ``{topcount:}``/``{quantiles:}`` all three
    sketches are first-class without the library API (VERDICT r10
    next #5)."""
    path: str
    avg: Optional[list] = None


@dataclass
class VIndexStmt:
    """``{vindex: group, in: g, on: 'embedding', path: 'dir',
    nlist: 64}`` — build + attach a MATERIALIZED l2 IVF vector index
    (catalog.Group.build_ivf_index): √n-auto nlist unless given,
    vectors stored in the index partitions so routed ``$near``+limit
    queries read only the probed lists.  The GQL surface of the
    reference's persisted HNSW lifecycle (HNSW.cpp:282-328 build,
    358-374 lazy reload).  Result row: (nlist, n_vectors).

    ``compact: true`` instead folds the local OLTP overlay into the
    ALREADY-attached index (catalog.Group.compact_into_index):
    rewrites only the affected list partitions — the batched analogue
    of the reference's incremental GHNSW::insert.  Result row:
    (lists_rewritten, rows_added).

    ``pq: true`` builds + attaches the IVFPQ (IVFADC) form instead
    (catalog.Group.build_ivfpq_index; ``m:``/``ksub:`` size the
    product quantizer): codes-only inverted lists ~dim·4/m smaller
    than the materialized-vector index — the shape you replicate hot
    when the corpus is 100 TB and the index must not be.

    ``attach: true`` re-wires an EXISTING persisted index at ``path``
    into the routed ``$near`` path with NO rebuild (fresh-session
    shape, symmetric with ``{layout attach:}``): the index kind
    (full-vector IVF vs IVFPQ) is discovered from its params sidecar.
    Result row: (kind, nlist)."""
    group: str
    path: str
    graph: Optional[str] = None
    on: str = "embedding"
    nlist: Optional[int] = None
    refine: int = 0
    compact: bool = False
    pq: bool = False
    m: int = 8
    ksub: int = 64
    attach: bool = False


@dataclass
class RemoveVertexStmt:
    group: str
    where: Any


@dataclass
class RemoveEdgeStmt:
    group: str
    pattern: WalkPattern


@dataclass
class DropStmt:
    graph: str


@dataclass
class DumpStmt:
    graph: str


@dataclass
class ShowGraphStmt:
    graph: Optional[str] = None


@dataclass
class UseGraphStmt:
    """``use graph 'x'`` (README.md §5 Utility — declared, not in the
    reference grammar): set the session's default graph so subsequent
    statements may omit ``in:``."""
    graph: str


@dataclass
class AstStmt:
    inner: Any


@dataclass
class ProfileStmt:
    inner: Any


@dataclass
class ImportStmt:
    path: str
