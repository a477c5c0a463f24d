from emiproc_spark.operators.basic import (  # noqa: F401
    add_inventories,
    drop,
    get_total_emissions,
    group_categories,
    group_substances,
    scale_inventory,
    total_emissions_almost_equal,
)
from emiproc_spark.operators.speciation import (  # noqa: F401
    merge_substances,
    speciate,
    speciate_nox,
)
from emiproc_spark.operators.cluster import (  # noqa: F401
    connected_components,
    dedup_keep_representative,
)
from emiproc_spark.operators.hotkeys import heavy_hitters  # noqa: F401
from emiproc_spark.operators.stats import profile_table  # noqa: F401
from emiproc_spark.operators.joins import (  # noqa: F401
    asof_join,
    merge_intervals,
    point_in_range_join,
    range_join,
    salted_join,
)
from emiproc_spark.operators.history import (  # noqa: F401
    latest_snapshot,
    resample_locf,
    scd2_compact,
)
from emiproc_spark.operators.layout import (  # noqa: F401
    cluster_by_zorder,
    layout_extents,
    zorder_key,
)
from emiproc_spark.operators.packing import (  # noqa: F401
    decontaminate,
    decontaminate_bloom,
    pack_sequences,
    shard_manifest,
)
from emiproc_spark.operators.sampling import (  # noqa: F401
    apply_mixture,
    hash_split,
    mixture_rates,
    sample_fraction,
    stratified_sample,
    weighted_sample,
)
from emiproc_spark.operators.behavior import (  # noqa: F401
    cohort_retention,
    funnel_counts,
    funnel_user_steps,
    rolling_active_users,
    rolling_event_features,
)
from emiproc_spark.operators.cluster import dedup_keep_best  # noqa: F401
from emiproc_spark.operators.dedup import (  # noqa: F401
    dup_token_fraction,
    duplicated_spans,
    minhash_agreement,
)
from emiproc_spark.operators.graph import pagerank  # noqa: F401
from emiproc_spark.operators.retrieval import bm25_topk  # noqa: F401
from emiproc_spark.operators.similarity import (  # noqa: F401
    semdedup,
    semdedup_flags,
)
from emiproc_spark.operators.stats import (  # noqa: F401
    group_quantiles,
    kmv_distinct,
    value_outliers,
)
from emiproc_spark.operators.text import (  # noqa: F401
    bigram_logprob,
    score_buckets,
)
