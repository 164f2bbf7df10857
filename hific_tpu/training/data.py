"""Input pipeline (host-side, thread-prefetched numpy).

Replaces the reference's torch DataLoader stack (src/helpers/datasets.py):
- TrainDataset: random scale in [max(crop/short_side, 0.75), 0.95], random
  crop to crop_size, horizontal flip, [0,1] floats (+ optional [-1,1]),
  returns (image, source-bpp) like the reference OpenImages dataset
  (datasets.py:181-270).
- EvalDataset: full images, no crop, returns (image, bpp, filename)
  (datasets.py:125-179).
Bad images are skipped, mirroring the exception-filtering collate
(datasets.py:43-45). A background thread keeps a small prefetch queue of
ready numpy batches so host decode overlaps device compute.
"""

import os
import queue
import threading
from typing import Iterator, List, Optional, Tuple

import numpy as np

IMG_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".ppm", ".webp")


def list_images(root: str) -> List[str]:
    files = []
    for dirpath, _, filenames in os.walk(root):
        for f in sorted(filenames):
            if f.lower().endswith(IMG_EXTENSIONS):
                files.append(os.path.join(dirpath, f))
    return sorted(files)


def _load_image(path: str) -> Optional[np.ndarray]:
    try:
        from PIL import Image

        with Image.open(path) as im:
            return np.asarray(im.convert("RGB"), dtype=np.uint8)
    except Exception:
        return None  # skip corrupt files, like exception_collate_fn


def _source_bpp(path: str, shape) -> float:
    """Bits-per-pixel of the file on disk (reference datasets.py:241-244)."""
    return 8.0 * os.path.getsize(path) / float(shape[0] * shape[1])


class TrainDataset:
    """Random-scale + random-crop + hflip training pipeline."""

    def __init__(self, root_or_files, crop_size: int = 256,
                 normalize: bool = False, seed: int = 0):
        if isinstance(root_or_files, str):
            self.files = list_images(root_or_files)
        else:
            self.files = list(root_or_files)
        if not self.files:
            raise ValueError("no training images found")
        self.crop_size = crop_size
        self.normalize = normalize
        self.rng = np.random.RandomState(seed)

    def _sample(self) -> Optional[Tuple[np.ndarray, float]]:
        path = self.files[self.rng.randint(len(self.files))]
        return self._sample_path(path, self.rng)

    def _sample_path(self, path: str, rng) -> Optional[Tuple[np.ndarray, float]]:
        img = _load_image(path)
        if img is None:
            return None
        h, w = img.shape[:2]
        bpp = _source_bpp(path, (h, w))

        shortest = min(h, w)
        crop = self.crop_size
        minimum_scale = crop / shortest
        scale_low = max(minimum_scale, 0.75)
        scale_high = max(scale_low, 0.95)
        scale = rng.uniform(scale_low, scale_high)
        nh, nw = max(crop, int(round(h * scale))), max(crop, int(round(w * scale)))
        if (nh, nw) != (h, w):
            from PIL import Image

            img = np.asarray(
                Image.fromarray(img).resize((nw, nh), Image.BILINEAR))
        top = rng.randint(img.shape[0] - crop + 1)
        left = rng.randint(img.shape[1] - crop + 1)
        img = img[top : top + crop, left : left + crop]
        if rng.rand() < 0.5:
            img = img[:, ::-1]
        x = img.astype(np.float32) / 255.0
        if self.normalize:
            x = x * 2.0 - 1.0
        return x, bpp

    def batches(self, batch_size: int, num_workers: int = 4
                ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Infinite batch stream; decode/augment fans out over a thread pool
        (PIL releases the GIL during decode/resize), the reference's
        4-worker DataLoader equivalent (datasets.py:70-75)."""
        if num_workers <= 1:
            while True:
                imgs, bpps = [], []
                while len(imgs) < batch_size:
                    s = self._sample()
                    if s is not None:
                        imgs.append(s[0])
                        bpps.append(s[1])
                yield np.stack(imgs), np.asarray(bpps, np.float32)

        from concurrent.futures import ThreadPoolExecutor

        lock = threading.Lock()

        def sample_locked_rng():
            # rng state is shared; guard the index draws, decode unlocked
            with lock:
                path = self.files[self.rng.randint(len(self.files))]
                seed = int(self.rng.randint(2 ** 31))
            return self._sample_path(path, np.random.RandomState(seed))

        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            pending = [pool.submit(sample_locked_rng)
                       for _ in range(batch_size + num_workers)]
            imgs, bpps = [], []
            while True:
                done = pending.pop(0)
                pending.append(pool.submit(sample_locked_rng))
                s = done.result()
                if s is None:
                    continue
                imgs.append(s[0])
                bpps.append(s[1])
                if len(imgs) == batch_size:
                    yield np.stack(imgs), np.asarray(bpps, np.float32)
                    imgs, bpps = [], []


class EvalDataset:
    """Full-resolution evaluation images with filenames."""

    def __init__(self, root_or_files, normalize: bool = False):
        if isinstance(root_or_files, str):
            self.files = list_images(root_or_files)
        else:
            self.files = list(root_or_files)
        self.normalize = normalize

    def __len__(self):
        return len(self.files)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, float, str]]:
        for path in self.files:
            img = _load_image(path)
            if img is None:
                continue
            x = img.astype(np.float32) / 255.0
            if self.normalize:
                x = x * 2.0 - 1.0
            yield x[None], _source_bpp(path, img.shape), path


class CityScapesDataset(TrainDataset):
    """CityScapes wrapper: fixed-aspect random crops from the leftImg8bit
    split layout (reference datasets.py:272-293). Behaves like TrainDataset
    over `<root>/leftImg8bit/<split>/*/*.png`."""

    def __init__(self, root: str, split: str = "train", crop_size: int = 256,
                 normalize: bool = False, seed: int = 0):
        img_dir = os.path.join(root, "leftImg8bit", split)
        super().__init__(img_dir if os.path.isdir(img_dir) else root,
                         crop_size=crop_size, normalize=normalize, seed=seed)


def prefetch(iterator, size: int = 4):
    """Run `iterator` in a daemon thread, keeping `size` batches ready."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(sentinel)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item
