"""multimodal_decoding_tpu — TPU-native fMRI decoding framework.

TPU-first rebuild of the capabilities of mitjanikolaus/multimodal_decoding:
ridge decoding of DNN latents from brain betas (whole-brain + surface
searchlight), pairwise cosine-ranking evaluation, and group-level
permutation/TFCE statistics, as batched JAX/XLA programs over device meshes
with a native C++ TFCE engine.  See COMPONENTS.md for the component map and
docs/MIGRATION.md for the reference-user migration guide.
"""

__version__ = "0.3.0"
