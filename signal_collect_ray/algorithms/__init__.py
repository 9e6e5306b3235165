from signal_collect_ray.algorithms.pagerank import (
    KatzCentrality,
    DanglingPageRank,
    PageRank,
    PersonalizedPageRank,
    TeleportWeightedPageRank,
)
from signal_collect_ray.algorithms.crawl import CrawlingPageRank
from signal_collect_ray.algorithms.hits import EigenvectorCentrality, Hits
from signal_collect_ray.algorithms.components import ConnectedComponents
from signal_collect_ray.algorithms.sssp import SSSP, MultiSourceBFS, SPCount, EarliestArrival, LatestDeparture, WidestPath
from signal_collect_ray.algorithms.mis import MaximalIndependentSet
from signal_collect_ray.algorithms.absorption import AbsorptionProb
from signal_collect_ray.algorithms.labelprop import ChineseWhispers, SeededLabelProp
from signal_collect_ray.algorithms.coloring import VertexColoring
from signal_collect_ray.algorithms.cellular import GameOfLife, KCore, SchellingSegregation
from signal_collect_ray.algorithms.densest import DensestPeel, peel_profile
from signal_collect_ray.algorithms.tokens import TokenDiffusion
from signal_collect_ray.algorithms.sudoku import Sudoku
from signal_collect_ray.algorithms.hamiltonian import simple_paths, best_paths
from signal_collect_ray.algorithms.cocitation import (
    adamic_adar_top_pairs,
    cocitation_top_pairs,
    jaccard_top_pairs,
)
from signal_collect_ray.algorithms.salsa import Salsa
from signal_collect_ray.algorithms.ktruss import edge_support, ktruss
from signal_collect_ray.algorithms.walks import node2vec_walks, random_walks
from signal_collect_ray.algorithms.hyperball import neighborhood_function
from signal_collect_ray.algorithms.betweenness import betweenness_sampled
from signal_collect_ray.algorithms.scc import scc_labels
from signal_collect_ray.algorithms.rectangles import rectangle_count
from signal_collect_ray.algorithms.sssp import shortest_path_tree
from signal_collect_ray.algorithms.dag import DagLongestPath, layers_from_state
from signal_collect_ray.algorithms.mst import minimum_spanning_forest
from signal_collect_ray.algorithms.modularity import (
    partition_modularity,
    louvain_one_level,
)
from signal_collect_ray.algorithms.triangles import (
    triangle_counts,
    total_triangles,
    triangle_list,
    clustering_coefficient,
)

__all__ = [
    "DanglingPageRank",
    "PageRank",
    "PersonalizedPageRank",
    "TeleportWeightedPageRank",
    "CrawlingPageRank",
    "Hits",
    "KatzCentrality",
    "EigenvectorCentrality",
    "ConnectedComponents",
    "SSSP",
    "SPCount",
    "EarliestArrival",
    "LatestDeparture",
    "WidestPath",
    "MultiSourceBFS",
    "MaximalIndependentSet",
    "AbsorptionProb",
    "ChineseWhispers",
    "SeededLabelProp",
    "VertexColoring",
    "GameOfLife",
    "KCore",
    "DensestPeel",
    "peel_profile",
    "SchellingSegregation",
    "TokenDiffusion",
    "Sudoku",
    "simple_paths",
    "cocitation_top_pairs", "adamic_adar_top_pairs", "jaccard_top_pairs",
    "Salsa",
    "edge_support",
    "ktruss",
    "scc_labels",
    "rectangle_count",
    "shortest_path_tree",
    "DagLongestPath", "layers_from_state",
    "minimum_spanning_forest",
    "partition_modularity",
    "louvain_one_level",
    "random_walks",
    "node2vec_walks",
    "neighborhood_function",
    "betweenness_sampled",
    "best_paths",
    "triangle_counts",
    "total_triangles",
    "triangle_list",
    "clustering_coefficient",
]
