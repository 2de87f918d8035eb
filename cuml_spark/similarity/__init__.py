from cuml_spark.similarity.ivf import IVFIndex
from cuml_spark.similarity.ivfpq import IVFPQIndex
from cuml_spark.similarity.kcenter import kcenter_select
from cuml_spark.similarity.quantize import (cosine_topk_int8,
                                            dequantize_int8,
                                            hamming_topk_bits,
                                            quantize_int8, sign_quantize)
from cuml_spark.similarity.neardup import (embedding_near_duplicates,
                                           keep_best_in_groups,
                                           near_dup_groups)
from cuml_spark.similarity.pq import PQIndex
from cuml_spark.similarity.semdedup import semantic_prune

__all__ = ["IVFIndex", "IVFPQIndex", "PQIndex", "cosine_topk_int8",
           "dequantize_int8", "embedding_near_duplicates",
           "hamming_topk_bits", "kcenter_select", "keep_best_in_groups",
           "near_dup_groups", "quantize_int8", "semantic_prune",
           "sign_quantize"]
