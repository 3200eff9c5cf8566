from molecular_dynamics_neural_operator_tpu.geometry.contact import (
    pairwise_distances,
    pairwise_sq_distances,
    contact_map,
    dense_edge_features,
    degree_from_adjacency,
    dense_to_padded_edges,
    padded_edges_device,
    edge_features_from_edges,
    contact_map_from_edges,
)

__all__ = [
    "pairwise_distances",
    "pairwise_sq_distances",
    "contact_map",
    "dense_edge_features",
    "degree_from_adjacency",
    "dense_to_padded_edges",
    "padded_edges_device",
    "edge_features_from_edges",
    "contact_map_from_edges",
]
