from anemoi_tpu.ops.segment import (
    graph_conv_aggregate,
    graph_transformer_attention,
    segment_softmax,
)
