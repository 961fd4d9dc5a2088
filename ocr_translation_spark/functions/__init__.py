from .text import (  # noqa: F401
    add_fingerprint,
    add_lang_id,
    add_quality,
    add_token_count,
    chunk_documents,
    STOPWORDS,
)
from .dedup import (  # noqa: F401
    exact_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard,
    simhash64,
    simhash_near_dup_pairs,
)
from .similarity import (  # noqa: F401
    brute_force_topk,
    lsh_bucketed_topk,
    srp_near_dup_pairs,
)
from .ivf import ivf_topk  # noqa: F401
from .sampling import hash_sample, stratified_sample  # noqa: F401
from .timeseries import asof_backward, interval_join  # noqa: F401
