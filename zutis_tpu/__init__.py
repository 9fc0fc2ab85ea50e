"""zutis-tpu: a TPU-native zero-shot semantic + unsupervised instance
segmentation framework built from scratch in JAX/Flax/Pallas.

Capabilities mirror NoelShin/zutis (see /root/repo/SURVEY.md): CLIP-retrieval
training data mining, SelfMask pseudo-labels with bilateral-solver refinement,
copy-paste synthesis, CLIP-ViT + query-decoder training with Hungarian-matched
mask losses, and zero-shot semantic/instance inference with COCO-style eval —
redesigned TPU-first: jitted train/eval steps, mesh/pjit sharding, Pallas
kernels on the hot paths.
"""

__version__ = "0.3.0"
