import builtins
import numpy as np

builtins.np = np  # NCL.py uses `np` at module run_kmeans without importing it


class _FlatIndex:
    def __init__(self, d):
        self.d = int(d)
        self._chunks = []

    def add(self, x):
        self._chunks.append(np.ascontiguousarray(x, dtype=np.float32))

    @property
    def _x(self):
        return (np.concatenate(self._chunks)
                if len(self._chunks) != 1 else self._chunks[0])

    def _rank(self, scores, k):
        # top-k by score descending, exact, deterministic tie-break by index
        n = scores.shape[1]
        k = min(int(k), n)
        if k < n:
            idx = np.argpartition(-scores, kth=k - 1, axis=1)[:, :k]
        else:
            idx = np.broadcast_to(np.arange(n), scores.shape).copy()
        part = np.take_along_axis(scores, idx, axis=1)
        order = np.lexsort((idx, -part), axis=1)[:, :k]
        I = np.take_along_axis(idx, order, axis=1)
        D = np.take_along_axis(part, order, axis=1)
        return D.astype(np.float32), I.astype(np.int64)


class IndexFlatIP(_FlatIndex):
    def search(self, q, k):
        q = np.asarray(q, dtype=np.float32)
        return self._rank(q @ self._x.T, k)


class IndexFlatL2(_FlatIndex):
    def search(self, q, k):
        q = np.asarray(q, dtype=np.float32)
        x = self._x
        d2 = ((q * q).sum(1)[:, None] - 2.0 * (q @ x.T)
              + (x * x).sum(1)[None, :])
        D, I = self._rank(-d2, k)
        return (-D).astype(np.float32), I


class Kmeans:
    def __init__(self, d, k, gpu=False, niter=20, seed=1234, **kw):
        self.d, self.k = int(d), int(k)
        self.niter, self.seed = int(niter), int(seed)
        self.centroids = None
        self.index = None

    def train(self, x):
        x = np.ascontiguousarray(x, dtype=np.float32)
        n = x.shape[0]
        rng = np.random.default_rng(self.seed)
        init = rng.choice(n, size=self.k, replace=n < self.k)
        c = x[init].copy()
        for _ in range(self.niter):
            d2 = ((x * x).sum(1)[:, None] - 2.0 * (x @ c.T)
                  + (c * c).sum(1)[None, :])
            assign = d2.argmin(1)
            counts = np.bincount(assign, minlength=self.k)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, x)
            upd = sums / np.maximum(counts, 1)[:, None]
            c = np.where((counts == 0)[:, None], c, upd)
            empty = np.flatnonzero(counts == 0)
            if empty.size:  # faiss splits big clusters; random restart is the
                c[empty] = x[rng.choice(n, size=empty.size)]  # simple analog
        self.centroids = c.astype(np.float32)
        self.index = IndexFlatL2(self.d)
        self.index.add(self.centroids)
