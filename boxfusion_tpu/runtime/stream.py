"""Stream iteration helpers shared by the online engines.

The reference processes a keyframe when ``count % gap == 0 *or* count ==
len(dataset)-1`` (demo.py:200): the FINAL frame of a sequence always
detects/associates, so its objects always reach the eval pickle even when
the sequence length is not a multiple of the keyframe gap (a 399-frame
gap-20 CA-1M sequence runs 21 keyframes, not 20).

Live streams have no ``__len__``, so instead of the reference's index test
every engine uses a one-frame lookahead: ``iter_with_last`` flags the final
yielded item of ANY iterable, sized or not.
"""
from __future__ import annotations

from typing import Iterable, Iterator, Tuple


def iter_with_last(dataset: Iterable) -> Iterator[Tuple[object, bool]]:
    """Yield ``(item, is_last)`` pairs via one-item lookahead.

    ``is_last`` is True exactly for the final item (the empty iterable
    yields nothing).  Lookahead pulls item i+1 before yielding item i; for
    the offline readers that is the next frame's decode, which the engines'
    own prefetchers already overlap."""
    it = iter(dataset)
    try:
        prev = next(it)
    except StopIteration:
        return
    for cur in it:
        yield prev, False
        prev = cur
    yield prev, True
