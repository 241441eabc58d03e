from mlio_tpu.dashboard.app import Dashboard, create_dashboard
from mlio_tpu.dashboard.recommendation import (
    OptimizationRecommender,
    KernelOptimizationRecommender,
    MemoryOptimizationRecommender,
    OperationFusionRecommender,
    ParallelismRecommender,
    Recommendation,
    generate_optimization_recommendations,
)
from mlio_tpu.dashboard import visualizations

__all__ = [
    "Dashboard",
    "create_dashboard",
    "OptimizationRecommender",
    "KernelOptimizationRecommender",
    "MemoryOptimizationRecommender",
    "OperationFusionRecommender",
    "ParallelismRecommender",
    "Recommendation",
    "generate_optimization_recommendations",
    "visualizations",
]
