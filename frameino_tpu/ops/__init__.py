from frameino_tpu.ops import norms, rope, attention, linear, embeddings, conv
