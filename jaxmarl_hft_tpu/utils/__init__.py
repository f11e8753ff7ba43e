from .tree import (tree_stack, tree_unstack, index_tree, rank_rev,
                   argsort_rev, clip_by_sum_int,
                   hamilton_apportionment_permuted_jax)
