from cuml_spark.benchmark.algorithms import (AlgorithmPair, algorithm_by_name,
                                             all_algorithms)
from cuml_spark.benchmark.runners import (AccuracyComparisonRunner,
                                          BenchmarkTimer,
                                          SpeedupComparisonRunner,
                                          run_variations)

__all__ = [
    "AlgorithmPair",
    "algorithm_by_name",
    "all_algorithms",
    "AccuracyComparisonRunner",
    "BenchmarkTimer",
    "SpeedupComparisonRunner",
    "run_variations",
]
