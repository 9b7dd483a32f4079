from anemoi_tpu.graphs.graph import EdgeSet, Graph, NodeSet
from anemoi_tpu.graphs.create import GraphCreator
