"""Host->device double-buffered prefetch.

Replaces torch DataLoader pinned-memory H2D copies + the per-iteration
`.to(device)` calls in the reference hot loop (reference train.py:393-394,
SemanticsLoader.py:130). A background thread keeps `depth` batches in flight:
while the TPU runs step N, batch N+1 is already being transferred, so the
input pipeline overlaps compute — the standard TPU recipe for keeping the MXU
fed when the model is small.

device_put uses a NamedSharding when a mesh is given, so each host transfer
lands pre-sharded across the data axis (the DDP-equivalent layout).
"""

import queue
import threading

import jax
import numpy as np


class DevicePrefetcher:
    """Iterate `loader`, device_put each batch with `sharding`, keep `depth`
    batches ahead."""

    def __init__(self, loader, sharding=None, depth: int = 2,
                 array_keys=("image", "depth", "semantics", "instance_labels",
                             "instance_areas")):
        self.loader = loader
        self.sharding = sharding
        self.depth = depth
        self.array_keys = array_keys

    def _put(self, batch):
        multihost = jax.process_count() > 1
        out = dict(batch)
        for k in self.array_keys:
            if k in out and isinstance(out[k], np.ndarray):
                if self.sharding is not None and multihost:
                    # each host contributes its local slice of the global batch
                    out[k] = jax.make_array_from_process_local_data(
                        self.sharding, out[k])
                elif self.sharding is not None:
                    out[k] = jax.device_put(out[k], self.sharding)
                else:
                    out[k] = jax.device_put(out[k])
        return out

    def __iter__(self):
        q = queue.Queue(maxsize=self.depth)
        sentinel = object()
        err = []

        def producer():
            try:
                for batch in self.loader:
                    q.put(self._put(batch))
            except BaseException as e:  # surface worker errors to the consumer
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item

    def __len__(self):
        return len(self.loader)
