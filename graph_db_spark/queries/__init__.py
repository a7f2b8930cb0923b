"""Query registry: every SURVEY §2 operator as a (Spark builder, oracle SQL)
pair for the driver's DuckDB correctness gate.

Conventions (driver compares row-count + schema + order-insensitive
value-hash, columns sorted by name):
- every computed column is aliased identically in Spark and SQL;
- float aggregation goes through DECIMAL (exact, order-independent) and is
  cast to DOUBLE at the end; divisions are rounded;
- top-k is always deterministic (row_number with unique tie-break);
- md5 is the portable hash for dedup/minhash/fingerprints.
"""

# Round-15 split (VERDICT r14 item 7): the monolithic queries.py became
# this package — registry machinery in _core, one module per family,
# same REGISTRY and the same driver_order()/all_queries()/all_oracles()
# surface. Family import order matters: a module may reference an
# earlier module's registered oracle (REGISTRY[...].oracle at decoration
# time), so pipeline imports after text and dedup.

from graph_db_spark.queries._core import (  # noqa: F401
    REGISTRY,
    Q,
    q,
    _t,
    _parquet_rows,
    _dec,
    _hex_int_sql,
    _hex_int,
    _kmeans_sampled_init_sql,
    _kmeans_iter_sql,
    _STORE_FMT,
    _dedup_store_path,
    _DRIVER_COVERED,
    driver_order,
    all_queries,
    all_oracles,
)
from graph_db_spark.queries import (  # noqa: F401,E402  (registration, in order)
    relational,
    graph,
    streaming,
    text,
    dedup,
    ann,
    pipeline,
)

# Back-compat re-exports: helpers tests/tools import from the package
# root (the pre-split queries.py exposed them at module level).
from graph_db_spark.queries.ann import ensure_ivfpq_store  # noqa: F401,E402
from graph_db_spark.queries.dedup import (  # noqa: F401,E402
    ensure_semantic_store,
    ensure_signature_store,
)
