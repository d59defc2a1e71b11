"""Driver-harness queries (SURVEY.md §5.2 item 4, FIXTURES.md §6).

One entry per implemented operator from SURVEY.md §2 + the
training-data additions, each over the driver testdata tables with a
DuckDB oracle twin in ORACLES (column names match EXACTLY — the driver
sorts columns by name before value-hashing). Non-SQL-expressible ops
(LSH dedup, seeded sampling, model-ish scoring, the full annotation
pipeline on synthetic pages) have no oracle → driver records the
weaker rows-only check.

Ray is initialised by the CALLER — nothing here calls ray.init.
"""

# Mechanically split into parts (VERDICT r04 item 6) —
# imported IN ORDER so QUERIES/ORACLES registration
# order is byte-identical to the pre-split module.
from . import queries_p01  # noqa: F401,E402
from . import queries_p02  # noqa: F401,E402
from . import queries_p03  # noqa: F401,E402
from . import queries_p04  # noqa: F401,E402
from . import queries_p05  # noqa: F401,E402
from . import queries_p06  # noqa: F401,E402
from ._qcommon import (  # noqa: F401,E402
    _BGP_KG_SQL,
    _CURATE_STOP_SQL,
    _FOLD_WORDS,
    _GOLD_TRIPLES_SQL,
    _HEARST_AUG_SQL,
    _HEARST_SUFFIXES,
    _KCORE_DEG,
    _KCORE_PEEL,
    _LPA_VOTE,
    _MIME_PREFIXES,
    _N2V_DRAW1,
    _N2V_DRAW2,
    _RAKE_STOP,
    _TABLE_CELLS_SQL,
    _TRUSS_ROUND,
    _URL_CANON_RE,
    _WL_ROUND,
    _bag_sides,
    _benford_oracle2,
    _bgp_kg,
    _coloring_round_sql,
    _crawl_budget_oracle,
    _derived_customer_edges,
    _docs,
    _er_golden_oracle,
    _events,
    _fs_em_oracle,
    _fs_oracle,
    _gold_triples,
    _hits_oracle_sql,
    _katz_oracle_sql,
    _langid_pred_sql,
    _matching_round_sql,
    _mis_round_sql,
    _outer_join_query,
    _outer_join_sides,
    _pagerank_oracle_sql,
    _pagerank_warm_oracle_sql,
    _ppr_oracle_sql,
    _rw_choice_sql,
    _setop_sides,
    _sm_block,
    _soundex_sql,
    _spread_round_sql,
    _table_corpus,
    _textrank_oracle_sql,
    _weighted_pagerank_oracle_sql,
    _wmatch_round_sql)
from .queries_p01 import *  # noqa: F401,F403,E402
from .queries_p02 import *  # noqa: F401,F403,E402
from .queries_p03 import *  # noqa: F401,F403,E402
from .queries_p04 import *  # noqa: F401,F403,E402
from .queries_p05 import *  # noqa: F401,F403,E402
from .queries_p06 import *  # noqa: F401,F403,E402
from .queryreg import ORACLES, QUERIES  # noqa: F401
