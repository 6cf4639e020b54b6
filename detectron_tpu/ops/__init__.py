"""In-graph (jit-compatible) detection ops: box geometry, anchors, NMS,
RoIAlign/RoIPool/RoICrop. Pallas TPU kernels live in the `pallas` subpackage;
each op has a pure-XLA reference implementation used for correctness tests and
CPU execution."""
