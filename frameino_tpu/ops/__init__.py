from frameino_tpu.ops import norms, rope, attention, linear, embeddings, conv, ms_deform_attn
