"""umbrella_tpu — a TPU-native (JAX/XLA/Pallas) speculative-decoding inference engine.

Built from scratch with the capabilities of Infini-AI-Lab/UMbreLLa (see SURVEY.md):
AWQ W4A16 quantized Llama/Qwen/Mistral/Gemma2 serving, Sequoia/SpecExec-style tree
speculative decoding (static growmap trees + dynamic beam trees), tree-masked
attention over a linear KV cache with accept-path compaction, host-DRAM weight
streaming, and — beyond the reference — tensor sharding over TPU meshes.
"""

__version__ = "0.1.0"
