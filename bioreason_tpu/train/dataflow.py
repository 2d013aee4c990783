"""Host-side input pipeline: shuffled epoch batching over in-memory items.

The reference leans on torch DataLoader + collate fns; here batching is a
plain generator feeding numpy batches (the collators already bucket shapes
for XLA stability). Also provides the GRPO `RepeatRandomSampler` analogue
(reference grpo_trainer.py:72-119): each sampled prompt index is repeated
`num_generations * num_iterations` times CONTIGUOUSLY so reward-group
normalization stays valid after gathering across data-parallel shards.
"""

from __future__ import annotations

import random
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence


def batch_iterator(items: Sequence[Any], collate_fn: Callable[[List[Any]], Dict],
                   batch_size: int, shuffle: bool = True, seed: int = 0,
                   drop_last: bool = True, epochs: Optional[int] = 1) -> Iterator[Dict]:
    epoch = 0
    while epochs is None or epoch < epochs:
        order = list(range(len(items)))
        if shuffle:
            random.Random(seed + epoch).shuffle(order)
        for start in range(0, len(order), batch_size):
            chunk = order[start:start + batch_size]
            if len(chunk) < batch_size:
                if drop_last:
                    break
                chunk = (chunk * batch_size)[:batch_size]  # pad by wrapping
            yield collate_fn([items[i] for i in chunk])
        epoch += 1


def prefetch(it: Iterator[Any], depth: int = 2) -> Iterator[Any]:
    """Run `it` (e.g. a collating batch_iterator) in a background thread with
    a bounded buffer, so host-side tokenization/collation overlaps the
    device step instead of serializing with it (the torch-DataLoader
    `num_workers` role; reference train_dna_qwen.py:497 uses num_workers=4,
    pin_memory). Exceptions re-raise at the consuming site. Abandoning the
    generator early (break / close) stops the producer thread instead of
    leaving it blocked on a full queue."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    errs: List[BaseException] = []
    stop = threading.Event()

    def worker():
        try:
            for x in it:
                while not stop.is_set():
                    try:
                        q.put(x, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:          # propagate to consumer
            errs.append(e)
        finally:
            # deliver the sentinel even if the buffer is momentarily full;
            # give up only once the consumer has signalled stop
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.1)
                    break
                except queue.Full:
                    continue

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            x = q.get()
            if x is sentinel:
                if errs:
                    raise errs[0]
                return
            yield x
    finally:
        stop.set()
        while True:                          # unblock a producer mid-put
            try:
                q.get_nowait()
            except queue.Empty:
                break


def repeat_random_indices(n_items: int, batch_prompts: int, num_generations: int,
                          seed: int, epoch: int) -> Iterator[List[int]]:
    """Yield per-step index lists where each prompt index appears
    `num_generations` times contiguously (RepeatRandomSampler semantics)."""
    order = list(range(n_items))
    random.Random(seed + epoch).shuffle(order)
    for start in range(0, len(order) - batch_prompts + 1, batch_prompts):
        prompts = order[start:start + batch_prompts]
        yield [i for i in prompts for _ in range(num_generations)]
