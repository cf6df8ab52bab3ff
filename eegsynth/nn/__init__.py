"""Neural-net building blocks: scan-GRU (+ Pallas fused cell), flash attention,
dense, spectral norm."""

from eegsynth.nn.attention import attention_xla, flash_attention, mha, set_attention_impl  # noqa: F401
from eegsynth.nn.gru import GRUParams, gru_init, gru_apply, gru_stack_init, gru_stack_apply  # noqa: F401
from eegsynth.nn.layers import dense_init, dense_apply, xavier_uniform  # noqa: F401
from eegsynth.nn.spectral_norm import sn_dense_init, sn_dense_apply  # noqa: F401
