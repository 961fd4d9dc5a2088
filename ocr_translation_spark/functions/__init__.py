from .text import (  # noqa: F401
    add_fingerprint,
    add_lang_id,
    add_quality,
    add_token_count,
    STOPWORDS,
)
from .dedup import (  # noqa: F401
    exact_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard,
    simhash64,
)
from .similarity import brute_force_topk, lsh_bucketed_topk  # noqa: F401
