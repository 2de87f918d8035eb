from cuml_spark.metrics.regression import (
    r2_score, r2_score_df, mean_squared_error, mean_absolute_error,
)
from cuml_spark.metrics.classification import accuracy_score, accuracy_score_df, log_loss
from cuml_spark.metrics.silhouette import silhouette_samples, silhouette_score
from cuml_spark.metrics.trustworthiness import trustworthiness
from cuml_spark.metrics.dispersion import cluster_dispersion, cluster_dispersion_df
from cuml_spark.metrics.cluster import (
    contingency_matrix,
    adjusted_rand_score,
    rand_score,
    entropy,
    entropy_df,
    mutual_info_score,
    homogeneity_completeness_v_measure,
    cluster_agreement_metrics,
    kl_divergence,
)

__all__ = [
    "r2_score", "r2_score_df", "mean_squared_error", "mean_absolute_error",
    "accuracy_score", "accuracy_score_df", "log_loss",
    "contingency_matrix", "adjusted_rand_score", "rand_score", "entropy",
    "entropy_df", "mutual_info_score", "homogeneity_completeness_v_measure",
    "cluster_agreement_metrics", "kl_divergence",
    "silhouette_samples", "silhouette_score", "trustworthiness",
    "cluster_dispersion", "cluster_dispersion_df",
]
