"""Scalar/vector functions: geometry kernels, text analysis, dedup
signatures, similarity search."""

from ..ann import (  # noqa: F401
    ann_range,
    ann_topk,
    dequantize_embeddings,
    ivf_topk,
    kmeans_distances,
    kmeans_lite,
    truncate_embeddings,
)
from ..dedup import (  # noqa: F401
    connected_components,
    contamination_overlap,
    content_hash,
    decontaminate,
    dedup_lines,
    neardup_decontaminate,
    semdedup,
    embedding_lsh_pairs,
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    neardup_components,
    neardup_dedup,
    ngram_jaccard_pairs,
    simhash64,
    simhash_pairs,
)
from ..stats import (  # noqa: F401
    countmin_sketch,
    countmin_topk,
    embedding_covariance,
    embedding_moments,
    grouped_quantiles,
    grouped_quantiles_cont,
    approx_quantiles,
    clip_by_quantiles,
    sample_exact_k,
    grouped_string_agg,
    grouped_zscore,
    keyed_lag,
    mixture_repeat,
    pca_project,
    pivot_counts,
    rollup_aggregate,
)
from ..pack import (  # noqa: F401
    global_prefix_sum,
    keyed_prefix_sum,
    pack_sequences,
    shuffle_by_hash,
    token_budget_take,
)
from ..frame import FrameProcessor, frame_apply  # noqa: F401
from ..geom import (  # noqa: F401
    BBoxIndex,
    cells_coverage,
    clip_rings_rect,
    points_in_rings,
    rings_area,
)
from ..text import (  # noqa: F401
    bigram_logprob_score,
    bm25_score,
    filter_cascade,
    lang_id,
    md5_fingerprint,
    ngram_diversity,
    quality_score,
    rolling_fingerprint,
    token_count,
    top_ngrams,
    winnow_fingerprints,
)
from ..joins import salted_join  # noqa: F401
from ..geom.proj import reproject, set_ref_crs, transform_xy  # noqa: F401
from ..hex import (  # noqa: F401
    general_g,
    gi_star,
    hex_axial,
    hex_center,
    hex_idw,
    hex_kde,
    hex_lattice_stats,
    hex_spatial_lag,
    local_morans_i,
    morans_i,
)
from ..hier import (  # noqa: F401
    geohash_encode,
    morton_decode,
    morton_encode,
    quadkey,
    zrange_cover,
)
from ..s2 import face_uv, s2_encode, s2_parent, uv_to_st  # noqa: F401
