from .model import DGCNN, DGCNNConfig, knn_graph
from .insitu import InSituLearning, featurize_object
