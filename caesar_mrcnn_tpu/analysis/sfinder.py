"""Source finding on (possibly huge) FITS mosaics — serial and
tile-decomposed.

Re-design of the reference ``SFinder``/``TileTask``
(reference: mrcnn/sfinder.py:267-1521):

* serial path: full-image read + Analyzer post-processing + catalog
  (reference run(): sfinder.py:450-523);
* tiled path (the long-context analogue, SURVEY.md §5): overlapping tile
  grid, windowed FITS reads so no rank materializes the mosaic, per-tile
  detection, edge flagging, gather, cross-tile merge, WCS source params
  (reference run_parallel(): sfinder.py:549-636).

TPU-first changes:

* tiles are all the same size by construction, so tile inference runs
  **batched** through one compiled graph (``batch_size`` tiles per device
  step) instead of one graph launch per tile;
* worker parallelism uses jax.distributed host gather over DCN
  (parallel/dist.py) instead of MPI send/recv;
* the cross-tile pixel-adjacency merge replaces the reference's
  O(pixels_i x pixels_j) double loop (reference: sfinder.py:786-810) with
  hashed neighbor-set intersection — O(pixels) per pair.
"""

from __future__ import annotations

import json
import os
import time
from collections import deque
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .. import logger
from ..config import Config
from ..parallel.dist import SerialComm, get_comm
from ..utils import fits as F
from ..utils.graph import UnionFind
from ..utils.stats import sigma_clipped_stats
from ..utils.tiles import generate_tiles, tiles_overlap
from .analyzer import Analyzer, NumpyEncoder
from .regions import make_regions_from_objs, write_ds9_regions


class SFinder:
    MASTER_ID = 0

    def __init__(self, detector, config: Config, comm=None):
        self.detector = detector
        self.config = config
        self.comm = comm or (get_comm() if config.split_img_in_tiles else SerialComm())
        self.analyzer = Analyzer(detector, config)
        self.analyzer.write_to_json = False
        self.analyzer.write_to_ds9 = False

        self.image_path = ""
        self.image_id = "img"
        self.nx = 0
        self.ny = 0
        self.header: Dict = {}
        self.wcs: Optional[F.LinearWCS] = None
        self.beam_area_pix = 0.0
        self.sources: Dict = {}
        self.outfile_json = ""
        self.outfile_ds9 = ""
        self.outfile_img = ""  # optional detection-overlay PNG
        self.max_ntasks_per_worker = config.max_ntasks_per_worker

    # ------------------------------------------------------------ header
    def set_img_size_params(self, image_path: str) -> int:
        """Read geometry/beam/WCS info (reference: sfinder.py:336-444)."""
        self.image_path = image_path
        self.image_id = os.path.splitext(os.path.basename(image_path))[0]
        header = F.read_header(image_path)
        self.header = header
        self.nx = int(header.get("NAXIS1", 0))
        self.ny = int(header.get("NAXIS2", 0))
        self.wcs = F.LinearWCS(header)
        bmaj = header.get("BMAJ")
        bmin = header.get("BMIN")
        dx = header.get("CDELT1", 0.0)
        dy = header.get("CDELT2", 0.0)
        if bmaj and bmin and dx and dy:
            beam_area = np.pi * float(bmaj) * float(bmin) / (4.0 * np.log(2.0))
            pix_area = abs(float(dx) * float(dy))
            self.beam_area_pix = beam_area / pix_area if pix_area > 0 else 0.0
        return 0

    # ------------------------------------------------------------ serial
    def run(
        self,
        image_path: str,
        xmin: int = -1,
        xmax: int = -1,
        ymin: int = -1,
        ymax: int = -1,
    ) -> Dict:
        """Whole-image (or sub-window) source finding
        (reference: sfinder.py:450-523; window knobs IMG_XMIN..IMG_YMAX,
        scripts/run.py:215-219)."""
        t0 = time.time()
        self.set_img_size_params(image_path)
        cfg = self.config
        out = F.read_fits(
            image_path,
            xmin=xmin, xmax=xmax, ymin=ymin, ymax=ymax,
            stretch=cfg.zscale_stretch,
            zscale_contrasts=cfg.zscale_contrasts,
            normalize=cfg.normalize_img,
            convert_to_rgb=cfg.img_to_rgb,
            to_uint8=cfg.img_to_uint8,
            stretch_biascontrast=cfg.bias_contrast_stretch,
            contrast=cfg.img_contrast,
            bias=cfg.img_bias,
        )
        if out is None:
            raise IOError(f"cannot read {image_path}")
        image, header = out
        r = self.detector.detect([image])[0]
        an = self.analyzer
        an.image = image
        an.image_id = self.image_id
        # sub-window reads report catalog coords in the full-image frame
        an.image_xmin = max(xmin, 0)
        an.image_ymin = max(ymin, 0)
        an.extract_det_masks(r["masks"], r["class_ids"], r["scores"])
        an.compute_obj_pars()
        an.make_json_results()
        if self.outfile_img:
            from .draw import draw_detections

            draw_detections(
                image, an.masks_final, an.class_names_final, an.scores_final,
                an.bboxes, outfile=self.outfile_img,
                title=f"detections: {self.image_id}",
            )
        self.sources = an.results
        for src in self.sources["objs"]:
            self._add_source_params(src)
        self.save()
        logger.info("SFinder.run done in %.2f s (%d sources)", time.time() - t0,
                    len(self.sources.get("objs", [])))
        return self.sources

    # ------------------------------------------------------------- tiled
    def run_tiled(self, image_path: str) -> Dict:
        """Tile-decomposed source finding with cross-tile merging
        (reference run_parallel: sfinder.py:549-636)."""
        t0 = time.time()
        cfg = self.config
        self.set_img_size_params(image_path)
        self.comm.barrier()

        tiles = generate_tiles(
            0, self.nx, 0, self.ny,
            cfg.tile_xsize, cfg.tile_ysize,
            cfg.tile_xstep, cfg.tile_ystep,
        )
        # round-robin tile ownership (reference: sfinder.py:1232-1251)
        my_tiles = [
            (i, t) for i, t in enumerate(tiles) if i % self.comm.size == self.comm.rank
        ]
        if len(my_tiles) > self.max_ntasks_per_worker:
            raise RuntimeError(
                f"{len(my_tiles)} tiles/worker exceeds max_ntasks_per_worker="
                f"{self.max_ntasks_per_worker} (reference guard: sfinder.py:1372-1382)"
            )
        logger.info(
            "worker %d/%d owns %d of %d tiles",
            self.comm.rank, self.comm.size, len(my_tiles), len(tiles),
        )

        # batched tile inference: tiles are identical size -> one compiled
        # graph serves batches of batch_size tiles. A producer thread reads +
        # preprocesses (zscale) the next batch while the device runs the
        # current one (the fit_generator-worker role,
        # reference: mrcnn/model.py:2487-2498).
        import queue
        import threading

        my_sources: List[Dict] = []
        # chunk by the DETECTOR's compiled batch: build_detector may have
        # shrunk num_devices to the locally available device count, so the
        # SFinder-side config's batch_size can be stale/larger.
        bs = getattr(self.detector, "config", cfg).batch_size
        chunks = [my_tiles[s : s + bs] for s in range(0, len(my_tiles), bs)]
        q: "queue.Queue" = queue.Queue(maxsize=2)

        det_cfg = getattr(self.detector, "config", None)
        fast_ok = det_cfg is not None and hasattr(self.detector, "dispatch_tiles")
        in_h, in_w = det_cfg.image_shape[:2] if fast_ok else (-1, -1)
        # The fast wire formats reproduce the read_fits chain only for the
        # default knob set: zscale on (equal per-channel contrasts — with
        # distinct contrasts the RGB channels genuinely differ and channel-0
        # broadcast would diverge from detect()), no bias-contrast stretch,
        # uint8 RGB output (reference chain: mrcnn/utils.py:1033-1163).
        fast_knobs = (
            cfg.zscale_stretch
            and not cfg.bias_contrast_stretch
            and cfg.img_to_rgb
            and cfg.img_to_uint8
            and len(set(cfg.zscale_contrasts)) == 1
        )
        wire = cfg.tile_wire if fast_knobs and fast_ok else "slow"
        contrast0 = cfg.zscale_contrasts[0]

        def read_one(x1, x2, y1, y2):
            """One windowed tile read -> (kind, payload).

            'u8'  : uint8 [H,W] — host-fused stretch, thin wire;
            'raw' : (f32 [H,W], (vmin, vmax)) — on-device preprocessing;
            'img' : preprocessed image via the full read_fits chain
                    (clamped border tiles and non-default knobs).
            """
            if (y2 - y1, x2 - x1) == (in_h, in_w) and wire in ("u8", "raw"):
                if wire == "raw":
                    out = F.read_tile_raw(image_path, x1, x2, y1, y2,
                                          contrast=contrast0)
                else:
                    out = F.read_tile_u8(image_path, x1, x2, y1, y2,
                                         contrast=contrast0)
                if out is not None:
                    return (wire, out)
            full = F.read_fits(
                image_path,
                xmin=x1, xmax=x2, ymin=y1, ymax=y2,
                stretch=cfg.zscale_stretch,
                zscale_contrasts=cfg.zscale_contrasts,
                normalize=cfg.normalize_img,
                convert_to_rgb=cfg.img_to_rgb,
                to_uint8=cfg.img_to_uint8,
                stretch_biascontrast=cfg.bias_contrast_stretch,
                contrast=cfg.img_contrast,
                bias=cfg.img_bias,
            )
            return ("img", full[0])

        def producer():
            try:
                for chunk in chunks:
                    items = [read_one(x1, x2, y1, y2)
                             for _, (x1, x2, y1, y2) in chunk]
                    q.put((chunk, items))
                q.put(None)
            except Exception as e:  # noqa: BLE001
                q.put(e)

        threading.Thread(target=producer, daemon=True).start()

        def as_image(kind, payload):
            """RGB image a detect() fallback would have gotten."""
            if kind == "u8":
                return np.stack([payload] * 3, axis=-1)
            if kind == "raw":
                from ..native import stretch_to_u8

                data, (vmin, vmax) = payload
                u8 = stretch_to_u8(data, vmin, vmax)
                return np.stack([u8] * 3, axis=-1)
            return payload

        # Pipelined dispatch: keep config.tile_pipeline_depth batches in
        # flight before the first collect, so host unmold + source
        # extraction overlap device upload+inference of later batches
        # (measured knee at depth 2 on the dev tunnel — CLAUDE.md).
        def dispatch(chunk, items):
            kinds = {k for k, _ in items}
            if kinds == {"u8"}:
                gray = np.stack([p for _, p in items])
                return ("handle", self.detector.dispatch_tiles(gray))
            if kinds == {"raw"}:
                raws = np.stack([p[0] for _, p in items])
                lims = np.asarray([p[1] for _, p in items], dtype=np.float32)
                return ("handle", self.detector.dispatch_tiles_raw(raws, lims))
            images = [as_image(k, p) for k, p in items]
            return ("results", self.detector.detect(images))  # resize path

        def consume(chunk, items, kind, payload):
            results = (
                self.detector.collect(payload) if kind == "handle" else payload
            )
            for (tile_idx, tile), (k, p), r in zip(chunk, items, results):
                img = p if k == "u8" else (p[0] if k == "raw" else p)
                my_sources.extend(
                    self._tile_sources(tile_idx, tile, tiles, img, r)
                )

        depth = max(0, int(getattr(cfg, "tile_pipeline_depth", 2)))
        pending: deque = deque()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, Exception):
                raise item
            chunk, items = item
            pending.append((chunk, items) + dispatch(chunk, items))
            if len(pending) > depth:
                consume(*pending.popleft())
        while pending:
            consume(*pending.popleft())

        # gather to master over DCN (replaces pickled MPI send/recv,
        # reference: sfinder.py:940-988)
        gathered = self.comm.gather(my_sources)
        self.comm.barrier()
        if gathered is None:  # non-master rank
            return {}
        all_sources = [s for worker in gathered for s in worker]

        merged = self._merge_edge_sources(all_sources)
        self.sources = {"image_id": self.image_id, "objs": []}
        for i, src in enumerate(merged):
            src["name"] = f"S{i + 1}"
            self._add_source_params(src)
            self.sources["objs"].append(src)
        self.save()
        logger.info(
            "SFinder.run_tiled done in %.2f s (%d tiles, %d sources)",
            time.time() - t0, len(tiles), len(self.sources["objs"]),
        )
        return self.sources

    # API-parity alias (reference name: sfinder.py:549)
    run_parallel = run_tiled

    # ------------------------------------------------------- tile detect
    def _tile_sources(
        self, tile_idx: int, tile, tiles, image: np.ndarray, r: Dict
    ) -> List[Dict]:
        """Post-process one tile's detections into global-coordinate source
        dicts with edge flags (reference TileTask.find_sources +
        find_sources_at_edge: sfinder.py:169-259, 643-706)."""
        x1t, x2t, y1t, y2t = tile
        an = self.analyzer
        an.image = image
        an.image_id = f"{self.image_id}_t{tile_idx}"
        an.image_xmin = x1t
        an.image_ymin = y1t
        an.extract_det_masks(r["masks"], r["class_ids"], r["scores"])
        an.obj_pars = []
        an.make_json_results()

        neighbors = [
            t for j, t in enumerate(tiles) if j != tile_idx and tiles_overlap(t, tile, gap=1)
        ]
        sources = []
        for obj in an.results["objs"]:
            # at tile border or inside a neighbor's overlap region?
            bx1, bx2, by1, by2 = obj["x1"], obj["x2"], obj["y1"], obj["y2"]
            at_tile_edge = (
                bx1 <= x1t or bx2 >= x2t - 1 or by1 <= y1t or by2 >= y2t - 1
            )
            in_overlap = any(
                tiles_overlap((bx1, bx2, by1, by2), n, gap=0) for n in neighbors
            )
            obj["edge"] = bool(at_tile_edge or in_overlap)
            obj["tile"] = tile_idx
            sources.append(obj)
        return sources

    # ------------------------------------------------------------ merge
    @staticmethod
    def _pixel_sets_adjacent(s1: set, s2: set) -> bool:
        """Any pixel pair within |dx|<=1 and |dy|<=1, on prebuilt hash
        sets: iterate the smaller set, probe its 3x3 neighborhood in the
        larger — O(9 * min(|P1|, |P2|)) with no per-pair set rebuild
        (replaces the reference's O(P1*P2) loop, sfinder.py:786-810)."""
        if len(s2) < len(s1):
            s1, s2 = s2, s1
        for y, x in s1:
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if (y + dy, x + dx) in s2:
                        return True
        return False

    @classmethod
    def _pixels_adjacent(cls, p1: Sequence, p2: Sequence) -> bool:
        """List-of-[y,x] wrapper around :meth:`_pixel_arrays_adjacent`."""
        return cls._pixel_arrays_adjacent(
            np.asarray(list(p1), np.int64).reshape(-1, 2),
            np.asarray(list(p2), np.int64).reshape(-1, 2),
        )

    @staticmethod
    def _pixel_arrays_adjacent(p1: np.ndarray, p2: np.ndarray) -> bool:
        """Any pixel pair within |dx|<=1 and |dy|<=1, fully vectorized.

        Rasterizes only the intersection strip of the two 1-expanded
        bounding boxes: pixels outside it cannot have a neighbor in the
        other set. One boolean grid is built from p1's strip pixels
        dilated by the 3x3 neighborhood (9 vectorized scatters), then
        probed at p2's strip pixels — O(strip + pixels-in-strip) numpy
        work, no per-pixel Python (survey-scale replacement for the
        reference's O(P1*P2) loop, sfinder.py:786-810; VERDICT r4
        item 8 — the per-pixel set-probe version cost ~100 ms per
        candidate pair at 10^5-pixel extended sources)."""
        if p1.size == 0 or p2.size == 0:
            return False
        y1 = int(max(p1[:, 0].min(), p2[:, 0].min())) - 1
        y2 = int(min(p1[:, 0].max(), p2[:, 0].max())) + 1
        x1 = int(max(p1[:, 1].min(), p2[:, 1].min())) - 1
        x2 = int(min(p1[:, 1].max(), p2[:, 1].max())) + 1
        if y2 < y1 or x2 < x1:
            return False

        def strip(p):
            m = (
                (p[:, 0] >= y1) & (p[:, 0] <= y2)
                & (p[:, 1] >= x1) & (p[:, 1] <= x2)
            )
            return p[m]

        s1, s2 = strip(p1), strip(p2)
        if s1.size == 0 or s2.size == 0:
            return False
        h, w = y2 - y1 + 1, x2 - x1 + 1
        # grid padded by 1 so the 3x3 dilation scatters never go negative
        grid = np.zeros((h + 2, w + 2), dtype=bool)
        yy, xx = s1[:, 0] - y1 + 1, s1[:, 1] - x1 + 1
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                grid[yy + dy, xx + dx] = True
        return bool(grid[s2[:, 0] - y1 + 1, s2[:, 1] - x1 + 1].any())

    def _merge_edge_sources(self, sources: List[Dict]) -> List[Dict]:
        """Union-find merge of edge sources from different tiles
        (reference merge_edge_sources: sfinder.py:711-935). The merged
        source keeps the class/score of the largest-by-npix fragment.

        Scalability (VERDICT r2 item 5): pixel hash sets are built once per
        edge source, and candidate pairs come from a spatial grid over
        expanded bboxes instead of the all-pairs O(E^2) sweep — survey-scale
        mosaics with thousands of edge sources stay sub-second."""
        n = len(sources)
        uf = UnionFind(n)
        edge_idx = [i for i in range(n) if sources[i].get("edge")]
        pix = {
            i: np.asarray(sources[i]["pixels"], np.int64).reshape(-1, 2)
            for i in edge_idx
        }
        cell = 256  # >= typical source extent; only bins, not correctness
        grid: Dict[Tuple[int, int], List[int]] = {}
        for i in edge_idx:
            s = sources[i]
            x1, x2 = int(s["x1"]) - 1, int(s["x2"]) + 1
            y1, y2 = int(s["y1"]) - 1, int(s["y2"]) + 1
            for cy in range(y1 // cell, y2 // cell + 1):
                for cx in range(x1 // cell, x2 // cell + 1):
                    grid.setdefault((cy, cx), []).append(i)
        tested = set()
        for members_in_cell in grid.values():
            for a in range(len(members_in_cell)):
                i = members_in_cell[a]
                for b in range(a + 1, len(members_in_cell)):
                    j = members_in_cell[b]
                    pair = (i, j) if i < j else (j, i)
                    if pair in tested:
                        continue
                    tested.add(pair)
                    if sources[i].get("tile") == sources[j].get("tile"):
                        continue
                    # bbox overlap gate
                    if not tiles_overlap(
                        (sources[i]["x1"] - 1, sources[i]["x2"] + 1,
                         sources[i]["y1"] - 1, sources[i]["y2"] + 1),
                        (sources[j]["x1"], sources[j]["x2"],
                         sources[j]["y1"], sources[j]["y2"]),
                        gap=1,
                    ):
                        continue
                    if self._pixel_arrays_adjacent(pix[i], pix[j]):
                        uf.union(i, j)

        groups: Dict[int, List[int]] = {}
        for i in range(n):
            groups.setdefault(uf.find(i), []).append(i)

        merged: List[Dict] = []
        for members in groups.values():
            if len(members) == 1:
                merged.append(sources[members[0]])
                continue
            # union pixels (dedup, lexicographically sorted like the old
            # sorted-set output); class/score from largest fragment.
            # Dedup via packed (y<<32)|x int64 keys: np.unique(axis=0)'s
            # structured-view sort is ~200x slower at 10^5-pixel sources
            # (measured 0.53 s vs ~3 ms per group); coords are
            # non-negative mosaic pixels so the pack is exact.
            cat = np.concatenate([pix[i] for i in members])
            key = (cat[:, 0] << 32) | cat[:, 1]
            ukey = np.unique(key)
            pix_all = np.stack([ukey >> 32, ukey & 0xFFFFFFFF], axis=1)
            largest = max(members, key=lambda i: len(sources[i]["pixels"]))
            src = dict(sources[largest])
            src["pixels"] = pix_all  # ndarray: see analyzer.make_json_results
            src["x1"], src["x2"] = (
                int(pix_all[:, 1].min()), int(pix_all[:, 1].max()))
            src["y1"], src["y2"] = (
                int(pix_all[:, 0].min()), int(pix_all[:, 0].max()))
            src["merged"] = True
            src["n_merged"] = len(members)
            src["vertexes"] = self._pixels_to_contours(pix_all)
            merged.append(src)
        return merged

    @staticmethod
    def _pixels_to_contours(pixels) -> List[List[List[float]]]:
        from . import masks as M

        p = np.asarray(
            pixels if not isinstance(pixels, set) else sorted(pixels), np.int64
        ).reshape(-1, 2)
        y0, x0 = int(p[:, 0].min()), int(p[:, 1].min())
        mask = np.zeros(
            (int(p[:, 0].max()) - y0 + 1, int(p[:, 1].max()) - x0 + 1),
            dtype=np.uint8,
        )
        mask[p[:, 0] - y0, p[:, 1] - x0] = 1
        return [(c + np.array([x0, y0])).tolist() for c in M.find_contours_xy(mask)]

    # ----------------------------------------------------- source params
    def _add_source_params(self, source: Dict, offset: int = 10) -> None:
        """Photometric/astrometric parameters from a windowed raw re-read
        (reference compute_source_params: sfinder.py:994-1211)."""
        import cv2

        if len(source.get("pixels", ())) == 0:
            return
        xmin, xmax = int(source["x1"]), int(source["x2"])
        ymin, ymax = int(source["y1"]), int(source["y2"])
        off_x = max(0, min(offset, self.nx - 1 - xmax, xmin))
        off_y = max(0, min(offset, self.ny - 1 - ymax, ymin))
        x_lo, y_lo = xmin - off_x, ymin - off_y
        dx = xmax - xmin + 1
        dy = ymax - ymin + 1
        smask = np.zeros((dy + 2 * off_y, dx + 2 * off_x), dtype=np.uint8)
        p = np.asarray(source["pixels"], np.int64).reshape(-1, 2)
        yy, xx = p[:, 0] - y_lo, p[:, 1] - x_lo
        keep = (
            (yy >= 0) & (yy < smask.shape[0]) & (xx >= 0) & (xx < smask.shape[1])
        )
        smask[yy[keep], xx[keep]] = 1
        try:
            simg, _ = F.read_fits_data(
                self.image_path,
                xmin=x_lo, xmax=xmax + off_x + 1,
                ymin=y_lo, ymax=ymax + off_y + 1,
            )
        except Exception:
            return
        if simg.shape != smask.shape:  # clamped at borders
            h = min(simg.shape[0], smask.shape[0])
            w = min(simg.shape[1], smask.shape[1])
            simg, smask = simg[:h, :w], smask[:h, :w]

        vals = simg[smask > 0]
        finite = vals[np.isfinite(vals)]
        pars: Dict = {}
        pars["npix"] = int(finite.size)
        if finite.size:
            pars["Ssum"] = float(np.sum(finite))
            pars["Smin"] = float(np.min(finite))
            pars["Smax"] = float(np.max(finite))
            mean, median, std = sigma_clipped_stats(finite)
            pars["Smean"], pars["Smedian"], pars["Sstddev"] = mean, median, std
            if self.beam_area_pix > 0:
                pars["flux"] = pars["Ssum"] / self.beam_area_pix  # Jy/beam -> Jy
                pars["nbeams"] = pars["npix"] / self.beam_area_pix

        mom = cv2.moments(smask, True)
        if mom["m00"] != 0:
            x0 = mom["m10"] / mom["m00"] + x_lo
            y0 = mom["m01"] / mom["m00"] + y_lo
            pars["x0"], pars["y0"] = float(x0), float(y0)
            img_w = np.where(smask > 0, np.nan_to_num(simg), 0.0).astype(np.float32)
            mom_w = cv2.moments(img_w, False)
            if mom_w["m00"] != 0:
                x0w = mom_w["m10"] / mom_w["m00"] + x_lo
                y0w = mom_w["m01"] / mom_w["m00"] + y_lo
            else:
                x0w, y0w = x0, y0
            pars["x0_w"], pars["y0_w"] = float(x0w), float(y0w)
            if self.wcs is not None:
                ra, dec = self.wcs.pixel_to_world(x0, y0)
                raw_, decw_ = self.wcs.pixel_to_world(x0w, y0w)
                pars["x0_wcs"], pars["y0_wcs"] = float(ra), float(dec)
                pars["x0_w_wcs"], pars["y0_w_wcs"] = float(raw_), float(decw_)
        source["pars"] = pars

    # -------------------------------------------------------------- save
    def save(self) -> None:
        """Write catalog json + DS9 regions (reference: sfinder.py:1389-1518)."""
        if self.comm.rank != self.MASTER_ID or not self.sources:
            return
        outfile_json = self.outfile_json or f"catalog_{self.image_id}.json"
        with open(outfile_json, "w") as fp:
            json.dump(self.sources, fp, indent=2, sort_keys=True, cls=NumpyEncoder)
        outfile_ds9 = self.outfile_ds9 or f"ds9_{self.image_id}.reg"
        regions = make_regions_from_objs(self.sources.get("objs", []))
        write_ds9_regions(regions, outfile_ds9)
