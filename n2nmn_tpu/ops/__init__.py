from n2nmn_tpu.ops.nn import (
    xavier_uniform,
    xavier_uniform_conv,
    init_fc,
    apply_fc,
    init_conv,
    apply_conv,
    init_embedding,
    l2_normalize,
    l2_of_weights,
)
from n2nmn_tpu.ops.lstm import (
    init_lstm_stack,
    lstm_stack_step,
    encode_sequence,
)
