"""TPU-native neuroevolution image-captioning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
rubencart/NES-img-captioning: two black-box population training algorithms
(NIC-ES truncation-selection GA and NIC-NES natural evolution strategy) applied
to an LSTM image-captioning decoder (MSCOCO, CIDEr-D fitness) and a small MNIST
CNN.

Where the reference runs a Redis master/relay/worker fleet of CPU processes
(reference: src/dist.py, src/main.py), this framework runs the whole population
loop as a single SPMD program over a TPU mesh: `vmap` over population members,
population axis sharded across chips, on-device counter-based Gaussian
perturbations reconstructed from seeds, and on-chip fitness-weighted gradient
aggregation. Only seeds, scalar fitnesses and generated token ids cross the
host boundary.
"""

__version__ = "0.1.0"
