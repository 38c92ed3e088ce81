"""PRNG key threading helpers.

JAX's explicit key discipline subsumes the reference's global seed dance
(``main.py:30-38``: python/numpy/torch/cudnn seeds). One root key per run;
every stochastic consumer (init, dropout, DropGraph masks, shuffles) receives
a fold of it.
"""

from __future__ import annotations

from typing import Iterator

import jax


def key_chain(seed: int) -> Iterator[jax.Array]:
    """Infinite stream of fresh keys derived from one seed."""
    key = jax.random.key(seed)
    counter = 0
    while True:
        counter += 1
        yield jax.random.fold_in(key, counter)
