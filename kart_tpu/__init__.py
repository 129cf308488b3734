"""kart-tpu: a TPU-native NGS read aligner with the capabilities of Kart.

Built from scratch for JAX/XLA/Pallas on TPU; see SURVEY.md for the layer
map of the reference aligner this reimplements.
"""

__version__ = "0.1.0"
