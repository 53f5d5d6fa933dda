"""Analytics operators: LLM-data-pipeline extensions over the core engine.

Everything here is declared through the DataFrame API so Catalyst picks the
physical plan; Python-side code only *builds* plans. Pandas UDFs appear
solely where built-ins cannot express the semantics (none of the operators
in this package need one on the hot path — similarity math uses JVM
higher-order functions).
"""

from moisturizer_spark.operators.asof import (  # noqa: F401
    asof_join,
    banded_interval_join,
    coalesce_intervals,
    pit_join,
    scd2_build,
)
from moisturizer_spark.operators.clustering import (  # noqa: F401
    assign_clusters,
    cluster_sizes,
    kmeans_fit,
    kmeans_inertia,
)
from moisturizer_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    fingerprint,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash,
)
from moisturizer_spark.operators.sampling import (  # noqa: F401
    hash_fraction,
    hash_split,
    quota_sample,
)
from moisturizer_spark.operators.similarity import (  # noqa: F401
    brute_force_top_k,
    cosine_similarity_col,
    embedding_cosine_pairs,
    ivf_top_k,
    lsh_top_k,
    retrain_if_drifted,
)
from moisturizer_spark.operators.skew import (  # noqa: F401
    hot_keys,
    key_skew_report,
    salted_join,
)
from moisturizer_spark.operators.textan import (  # noqa: F401
    bm25_topk,
    bpe_tokens_col,
    language_id,
    quality_features,
    token_entropy,
    token_stats,
    winnowing_fingerprints,
    winnowing_near_duplicates,
)
from moisturizer_spark.operators.multimodal import (  # noqa: F401
    video_near_duplicates,
    video_phash,
)
from moisturizer_spark.operators.tokenizer import (  # noqa: F401
    bpe_segment,
    bpe_train,
)
from moisturizer_spark.operators.expectations import (  # noqa: F401
    chi2_report,
    ks_report,
    profile_numeric,
    profile_numeric_approx,
    psi_report,
)
from moisturizer_spark.operators.graph import (  # noqa: F401
    hits_bipartite,
    lpa_communities,
    pagerank_int,
    triangle_count,
)
from moisturizer_spark.operators.joins import (  # noqa: F401
    bloom_prefilter,
)
from moisturizer_spark.operators.stats import (  # noqa: F401
    auc_exact,
    group_ols,
    pmi_table,
    poisson_bootstrap_ci,
    quantile_normalize_dims,
    seasonal_naive_eval,
)
