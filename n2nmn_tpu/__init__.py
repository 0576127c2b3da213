"""n2nmn_tpu — a TPU-native End-to-End Module Network (N2NMN) framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the ICCV'17
"Learning to Reason: End-to-End Module Networks for Visual Question
Answering" codebase (reference: ronghanghu/n2nmn, TF 1.0 + TensorFlow Fold).

Key architectural transformation vs the reference: the Fold dynamic-batching
VM plus two-phase ``tf.Session.partial_run`` execution (reference
exp_clevr/train_clevr_gt_layout.py:169-196) is replaced by a single jitted
XLA program — the layout decoder, the grammar-validity automaton, and a
padded static stack-machine module executor all fuse into one device
program with no host round-trips.
"""

__version__ = "0.1.0"
