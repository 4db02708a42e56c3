"""Mesh-sharded scale-out (SURVEY.md §2.7).

The reference's only parallelism is chains-over-OS-processes via pmap
(src/utils.jl:91-98).  Here chains are a vmap axis partitioned over a
``jax.sharding.Mesh`` — XLA's GSPMD inserts the collectives; and large
observation axes can additionally be sharded (the sequence-parallel analog)
by giving observed sites a PartitionSpec, turning the likelihood reduction
into a psum over the data axis."""

from .mesh import (chain_sharding, distributed_init, global_mesh,
                   make_mesh, shard_chain_tree)

__all__ = ["make_mesh", "chain_sharding", "shard_chain_tree",
           "distributed_init", "global_mesh"]
