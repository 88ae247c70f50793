from .geometry import (
    pairwise_sqdist,
    knn,
    knn_self,
    furthest_point_sample,
    gather_points,
    group_points,
    ball_query,
    three_nn,
    three_interpolate,
    group_neighborhood,
    resample_to,
    separate_point_cloud,
)

__all__ = [
    "pairwise_sqdist",
    "knn",
    "knn_self",
    "furthest_point_sample",
    "gather_points",
    "group_points",
    "ball_query",
    "three_nn",
    "three_interpolate",
    "group_neighborhood",
    "resample_to",
    "separate_point_cloud",
]
