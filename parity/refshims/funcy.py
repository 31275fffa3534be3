"""Minimal funcy stand-in: only the functions the reference uses."""
from functools import partial  # noqa: F401


import collections.abc


def _is_seq(x):
    # funcy's is_seqcont: list/tuple/iterator/generator/range — NOT dict,
    # set or str (funcy flattens sequence containers only).
    return isinstance(
        x, (list, tuple, range, collections.abc.Iterator)
    )


def flatten(seq):
    for item in seq:
        if _is_seq(item):
            yield from flatten(item)
        else:
            yield item


def lflatten(seq):
    return list(flatten(seq))


def lmap(f, *seqs):
    return list(map(f, *seqs))


def lfilter(pred, seq):
    return list(filter(pred, seq))
