"""jaxmarl_hft_tpu — TPU-native multi-agent HFT framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
biiiipy/JaxMARL-HFT: a vectorized limit-order-book engine driven by LOBSTER
message replay, heterogeneous market-making / execution / directional agents
under a JaxMARL-style multi-agent API, and an on-device IPPO-RNN trainer that
scales over TPU meshes via jit + sharding.
"""
__version__ = "0.1.0"
