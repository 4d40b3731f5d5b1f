"""gaviko-tpu: a TPU-native JAX framework for volumetric MRI classification.

Rebuilds the full capability surface of GAViKO (gMedAI-Lab/GAViKO) idiomatically
for TPU: a 3D Vision Transformer backbone over (1, 120, 160, 160) volumes with
Pallas flash attention, the complete PEFT method family (gaviko, vpt, adaptformer,
ssf, melo/LoRA, bitfit, dvpt, evp, linear, fft) as parameter-surgery modules over
a single functional core, and the reference's public contract (train/eval/inference
entry points, YAML configs, trainable-only checkpoints, timm weight conversion).

Params are flat ``dict[str, jax.Array]`` pytrees keyed by the PyTorch reference's
``state_dict`` names, so checkpoints, trainable-parameter masks, and the weight
converter interoperate with the reference bit-for-bit.
"""

__version__ = "0.1.0"
