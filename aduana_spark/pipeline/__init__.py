"""Training-data pipeline operators: dedup, similarity search, text
analysis, multimodal plumbing. These extend the engine beyond the
reference's own surface for 100 TB-scale corpus curation."""

from aduana_spark.pipeline.decontaminate import (  # noqa: F401
    decontaminate,
    ngram_contamination,
)
from aduana_spark.pipeline.dedup import (  # noqa: F401
    embedding_near_duplicates,
    exact_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
    simhash_verified_near_duplicates,
)
from aduana_spark.pipeline.similarity import (  # noqa: F401
    add_ivf_cells,
    add_lsh_buckets,
    brute_force_topk,
    ivf_topk,
    kmeans_centroids,
    lsh_topk,
    query_signature,
)
from aduana_spark.pipeline.textstats import (  # noqa: F401
    document_fingerprint,
    entity_density_score,
    repetition_signals,
    triangle_score_col,
    keyword_score_col,
    language_id,
    quality_scores,
    token_count_col,
)
from aduana_spark.pipeline.avi import (  # noqa: F401
    decode_avi_mjpeg,
    encode_avi_mjpeg,
)
from aduana_spark.pipeline.jpeg import (  # noqa: F401
    decode_jpeg,
    encode_jpeg,
)
from aduana_spark.pipeline.multimodal import (  # noqa: F401
    decode_bmp,
    decode_gif,
    decode_png,
    decode_wav,
    extract_frame_features,
    extract_media_features,
    frame_sample_plan,
    synthesize_media,
)
