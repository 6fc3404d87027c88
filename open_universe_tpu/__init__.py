"""open-universe-tpu: TPU-native universal score-based speech enhancement.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
line/open-universe (UNIVERSE and UNIVERSE++): conditional diffusion speech
enhancement with conv/GRU score + conditioner networks, GAN and MDN training
losses, LoRA fine-tuning, speech-quality metrics, and data-parallel training
over TPU meshes.
"""
__version__ = "0.1.0"
