"""Shared attention-formulation knob.

'folded' routes the attention layers (CLIP towers, kMaX axial + query
self-attention) through head-folded / transpose-free einsum formulations;
'legacy' is the split/reshape/transpose original. Both are numerically
identical with the identical parameter tree — only the data movement in
the compiled graph differs (parity tests: tests/test_clip_engine.py,
tests/test_kmax.py).

Why folded exists: a device trace of the headline tiled CLIP encode
(bench.py SAI_BENCH_TRACE, v5e) attributed 32% of the encode module to
attention DATA MOVEMENT — qkv split 19.2 ms, head reshape 18.9 ms, output
transpose 8.1 ms per 6 chunks — while the projection matmuls ran at
179 TF/s (91% of bf16 peak). Folding the head dim into the projection
einsums (and writing the attention einsums over the untransposed layout)
removes those copies from the graph instead of trying to out-schedule XLA
with a Pallas kernel (which measured neutral because it only covered
softmax(QK^T)V, not this plumbing).

Read at TRACE time: flipping SAI_ATTN in-process requires jax.clear_caches().
"""

import os


def attention_mode() -> str:
    return os.environ.get("SAI_ATTN", "folded")
