"""Detection pipeline: mold -> jitted forward -> unmold.

Re-design of ``MaskRCNN.detect`` (reference: mrcnn/model.py:2623-2762):
molding (resize + mean subtraction + meta packing,
reference: mrcnn/model.py:2519-2556), a single jit-compiled device graph,
and host-side unmolding (padding strip, window->original-pixel boxes,
mask paste, reference: mrcnn/model.py:2558-2621).

The jitted step is compiled once per (batch, image-shape) signature and
reused — variable batch tails are padded up to the compiled batch size.
"""

from __future__ import annotations

import sys
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import logger
from ..config import Config
from ..models.mask_rcnn import MaskRCNN, make_inference_fn
from ..models.meta import compose_image_meta
from ..utils import boxes as B
from ..utils import image as I
from ..utils.anchors import get_anchors


class Detector:
    """Stateful wrapper: model + variables + compiled detect step.

    With ``mesh`` (a 1-D ``jax.sharding.Mesh`` over the ``data`` axis) the
    detect graphs are compiled with the image/tile batch sharded across all
    mesh devices and parameters replicated — one process saturates every
    local chip (the inference half of the reference's ParallelModel,
    mrcnn/parallel_model.py:30-104, wired at mrcnn/model.py:2161-2165).
    ``config.batch_size`` is the GLOBAL batch
    (``images_per_device * num_devices``, reference: mrcnn/config.py:227)
    and must be divisible by the mesh size.
    """

    def __init__(
        self, config: Config, model: MaskRCNN, variables: Dict, mesh=None
    ):
        self.config = config
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import batch_sharding, replicated

            n = int(np.prod(mesh.devices.shape))
            if config.batch_size % n != 0:
                raise ValueError(
                    f"global batch {config.batch_size} not divisible by "
                    f"mesh size {n}"
                )
            self._rep = replicated(mesh)
            self._data = batch_sharding(mesh)
        else:
            self._rep = self._data = None
        self._stages = None  # int8 stage overrides after quantize()
        self.variables = variables  # property: device-resident
        self._fn = self._build_fn()
        self._premold = None  # lazily-jitted device-side mold for tiles
        self._premold_raw = None  # device-side full preprocessing chain
        self._tile_fns = {}  # wire -> fused jitted (premold + forward + pack)
        self._tile_consts = {}  # (h, w, bs) -> device-resident (metas, anchors)

    def _build_fn(self):
        """Compile the detect step for the current stage overrides."""
        if self.mesh is None:
            return make_inference_fn(self.model, stages=self._stages)
        from ..models.mask_rcnn import forward_inference

        model, stages = self.model, self._stages
        return jax.jit(
            lambda v, im, me, an: forward_inference(
                model, v, im, me, an, stages=stages
            ),
            in_shardings=(self._rep, self._data, self._data, self._rep),
            out_shardings=self._data,
        )

    # ------------------------------------------------------- quantization
    def quantize(self, calib_images: Sequence[np.ndarray]) -> None:
        """Post-training int8 quantization of the detect graph.

        Folds frozen BN, calibrates per-tensor activation scales on
        ``calib_images`` (host images; molded exactly like :meth:`detect`
        inputs), quantizes weights per-out-channel, and recompiles the
        detect/tile graphs with the int8 stages
        (models/heads_int8.py). Idempotent per weight set; call again
        after loading new weights.
        """
        molded, metas, _ = self.mold_inputs(calib_images)
        anchors = get_anchors(self.config, molded[0].shape)
        self._quantize_molded(molded, metas, anchors)

    def _quantize_molded(self, molded, metas, anchors) -> None:
        from ..models import heads_int8 as Q

        cfg = self.config
        host_vars = jax.device_get(self._variables)
        host_vars.pop("quant", None)
        qtree = Q.build_detect_qtree(
            self.model, host_vars, cfg, molded, metas, np.asarray(anchors)
        )
        self._stages = Q.int8_stages(cfg)
        self.variables = {**host_vars, "quant": qtree}
        self._fn = self._build_fn()
        self._tile_fns = {}
        logger.info(
            "detect graph quantized: int8 weights+activations at %d conv "
            "sites (config.quant_mode)", len(qtree),
        )

    def _maybe_autoquant(self, molded, metas, anchors) -> None:
        """First-batch auto-calibration when ``config.quant_mode='int8'``."""
        if (
            getattr(self.config, "quant_mode", "none") == "int8"
            and self._stages is None
        ):
            self._quantize_molded(
                np.asarray(molded, np.float32), np.asarray(metas), anchors
            )

    def _put_batch(self, x):
        """Host batch array -> device, batch-sharded when on a mesh."""
        if self._data is not None:
            return jax.device_put(np.asarray(x), self._data)
        return jnp.asarray(x)

    @property
    def variables(self) -> Dict:
        return self._variables

    @variables.setter
    def variables(self, value: Dict) -> None:
        # Weights restored from checkpoints arrive as host numpy trees;
        # if they stay host-side, EVERY detect call silently re-uploads
        # the full parameter set (~250 MB for ResNet-101 — measured 5 s
        # per batch through the TPU tunnel). Pin them to device once
        # (replicated over the mesh when sharded).
        if self._rep is not None:
            self._variables = jax.device_put(value, self._rep)
        else:
            self._variables = jax.device_put(value)
        if self._stages is not None and "quant" not in value:
            # Fresh (unquantized) weights invalidate the int8 graph; drop
            # back to the exact path until quantize() is called again.
            logger.info("new weights loaded — int8 detect graph reset")
            self._stages = None
            self._fn = self._build_fn()
            self._tile_fns = {}

    # ----------------------------------------------------------- molding
    def mold_inputs(self, images: Sequence[np.ndarray]):
        """Resize + mean-subtract + pack meta (reference:
        mrcnn/model.py:2519-2556)."""
        cfg = self.config
        molded, metas, windows = [], [], []
        for image in images:
            m, window, scale, _pad, _crop = I.resize_image(
                image,
                min_dim=cfg.image_min_dim,
                min_scale=cfg.image_min_scale,
                max_dim=cfg.image_max_dim,
                mode=cfg.image_resize_mode,
            )
            molded.append(I.mold_image(m, cfg.mean_pixel))
            metas.append(
                compose_image_meta(
                    0, image.shape, m.shape, window, scale, np.zeros(cfg.num_classes)
                )
            )
            windows.append(window)
        return (
            np.stack(molded).astype(np.float32),
            np.stack(metas).astype(np.float32),
            np.stack(windows),
        )

    # ------------------------------------------------------------ unmold
    def unmold_detections(
        self, detections: np.ndarray, mrcnn_mask: np.ndarray,
        original_image_shape, image_shape, window,
    ):
        """One image's padded device outputs -> pixel-space results
        (reference: mrcnn/model.py:2558-2621)."""
        zero_ix = np.where(detections[:, 4] == 0)[0]
        n = zero_ix[0] if zero_ix.shape[0] > 0 else detections.shape[0]

        boxes = detections[:n, :4]
        class_ids = detections[:n, 4].astype(np.int32)
        scores = detections[:n, 5]
        masks = mrcnn_mask[:n]
        if masks.dtype == np.uint8:  # u8 mask wire (config.mask_wire_dtype)
            masks = masks.astype(np.float32) / 255.0

        window_n = B.norm_boxes(np.asarray(window), image_shape[:2])
        wy1, wx1, wy2, wx2 = window_n
        shift = np.array([wy1, wx1, wy1, wx1])
        wh = wy2 - wy1
        ww = wx2 - wx1
        scale = np.array([wh, ww, wh, ww])
        boxes = np.divide(boxes - shift, scale)
        boxes = B.denorm_boxes(boxes, original_image_shape[:2])

        exclude = np.where(
            (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]) <= 0
        )[0]
        if exclude.shape[0] > 0:
            boxes = np.delete(boxes, exclude, axis=0)
            class_ids = np.delete(class_ids, exclude, axis=0)
            scores = np.delete(scores, exclude, axis=0)
            masks = np.delete(masks, exclude, axis=0)
            n = class_ids.shape[0]

        full_masks = [
            I.unmold_mask(masks[i], boxes[i], original_image_shape) for i in range(n)
        ]
        full_masks = (
            np.stack(full_masks, axis=-1)
            if full_masks
            else np.empty(tuple(original_image_shape[:2]) + (0,))
        )
        return boxes, class_ids, scores, full_masks

    # ------------------------------------------------- tiled fast path
    def _make_premold_u8(self):
        """Device-side mold for uint8 tiles: cast + gray->RGB broadcast +
        mean subtraction, so the host->device wire carries uint8
        single-channel pixels (12x fewer bytes than molded float32 RGB —
        the tunnel transfer dominated the tiled e2e path)."""
        mean = jnp.asarray(self.config.mean_pixel, dtype=jnp.float32)
        nch = self.config.image_channel_count

        def premold(raw):  # [B, H, W] or [B, H, W, C], any dtype
            x = raw.astype(jnp.float32)
            if x.ndim == 3:
                x = jnp.broadcast_to(x[..., None], x.shape + (nch,))
            return x - mean

        return premold

    def _make_premold_raw(self):
        """Device-side preprocessing for RAW tile pixels: the full
        astronomy chain (NaN fill -> zscale interval map -> clip ->
        uint8 quantization -> RGB broadcast -> mean subtraction) fused
        on-chip, so the 1-CPU host only reads bytes and fits zscale
        limits on a 1000-pixel subsample (VERDICT r2 item 1; semantics:
        mrcnn/utils.py:1033-1163). The wire carries f32 raw pixels (4x
        the uint8 fast path) — the tunnel decides which wins."""
        cfg = self.config
        mean = jnp.asarray(cfg.mean_pixel, dtype=jnp.float32)
        nch = cfg.image_channel_count

        def premold_raw(raw, vmin, vmax):  # [B,H,W] f32, [B], [B]
            x = raw.astype(jnp.float32)
            finite = jnp.isfinite(x)
            guarded = jnp.where(finite, x, jnp.inf)
            fill = jnp.min(guarded, axis=(1, 2), keepdims=True)
            fill = jnp.where(jnp.isfinite(fill), fill, 0.0)
            x = jnp.where(finite, x, fill)
            lo = vmin[:, None, None]
            span = vmax[:, None, None] - lo
            x = jnp.where(span > 0, (x - lo) / span, 0.0)
            x = jnp.clip(x, 0.0, 1.0)
            # uint8-quantization parity with the host path (gray2rgb
            # rounds to 0..255; normalize-after-zscale is the identity,
            # see utils/fits.py::preprocess_tile_u8)
            x = jnp.round(x * 255.0)
            x = jnp.broadcast_to(x[..., None], x.shape + (nch,))
            return x - mean

        return premold_raw

    def _premold_fn(self):
        """Standalone jitted u8 premold (parity tests; the hot path uses
        the fused :meth:`_tile_fn`, which shares the same math)."""
        if self._premold is None:
            self._premold = jax.jit(self._make_premold_u8())
        return self._premold

    def _premold_raw_fn(self):
        """Standalone jitted raw premold (parity tests; see above)."""
        if self._premold_raw is None:
            self._premold_raw = jax.jit(self._make_premold_raw())
        return self._premold_raw

    def _tile_fn(self, wire: str):
        """Fused jitted tile step: device-side premold + forward + packed
        output, ONE jit dispatch per batch and (with the u8 mask wire) ONE
        device->host fetch per batch.

        Through the tunneled-TPU RPC channel every dispatch/fetch costs
        fixed latency on top of ~16-21 MB/s upload bandwidth (measured,
        CLAUDE.md); the tiled hot loop is channel-bound, so RPC count is
        throughput. The packed buffer is ``[B, D, 24 + mh*mw]`` uint8:
        detections bitcast to 24 bytes + the u8 mask plane.
        """
        if wire not in self._tile_fns:
            from ..models.mask_rcnn import forward_inference

            cfg = self.config
            model = self.model
            stages = self._stages
            pack = cfg.mask_wire_dtype == "uint8"
            premold_u8 = self._make_premold_u8()
            premold_raw = self._make_premold_raw()

            def run(variables, molded, metas, anchors):
                out = forward_inference(
                    model, variables, molded, metas, anchors, stages=stages
                )
                if not pack:
                    return out
                b, d = out.detections.shape[:2]
                det_bytes = jax.lax.bitcast_convert_type(
                    out.detections.astype(jnp.float32), jnp.uint8
                ).reshape(b, d, 24)
                m = out.masks.reshape(b, d, -1)
                return jnp.concatenate([det_bytes, m], axis=-1)

            if wire == "u8":

                def fn_u8(variables, raw, metas, anchors):
                    return run(variables, premold_u8(raw), metas, anchors)

                if self.mesh is None:
                    fn = jax.jit(fn_u8)
                else:
                    fn = jax.jit(
                        fn_u8,
                        in_shardings=(self._rep, self._data, self._data,
                                      self._rep),
                        out_shardings=self._data,
                    )

            else:

                def fn_raw(variables, raw, vmin, vmax, metas, anchors):
                    return run(
                        variables, premold_raw(raw, vmin, vmax), metas, anchors
                    )

                if self.mesh is None:
                    fn = jax.jit(fn_raw)
                else:
                    fn = jax.jit(
                        fn_raw,
                        in_shardings=(self._rep, self._data, self._data,
                                      self._data, self._data, self._rep),
                        out_shardings=self._data,
                    )

            self._tile_fns[wire] = fn
        return self._tile_fns[wire]

    def _unpack(self, out):
        """Packed tile-step buffer (or InferenceOutput) -> host arrays."""
        if hasattr(out, "detections"):
            return np.asarray(out.detections), np.asarray(out.masks)
        # The device bitcast emits little-endian bytes; reinterpreting on a
        # big-endian host would scramble boxes/scores silently.
        if sys.byteorder != "little":
            raise RuntimeError(
                "packed tile wire requires a little-endian host; "
                "set config.mask_wire_dtype='float32' to disable packing"
            )
        buf = np.asarray(out)  # [B, D, 24 + mh*mw] u8 — single fetch
        b, d, _ = buf.shape
        detections = (
            np.ascontiguousarray(buf[:, :, :24]).view(np.float32).reshape(b, d, 6)
        )
        mh = 2 * self.config.mask_pool_size
        masks = buf[:, :, 24:].reshape(b, d, mh, -1)
        return detections, masks

    def _autoquant_tiles(self, molded_like: np.ndarray) -> None:
        """Auto-calibrate the int8 graph from a tile batch.

        ``molded_like``: [B, H, W] or [B, H, W, C] HOST pixels already in
        the network's molded range (the same math the device premold
        applies). Broadcasts grayscale to the model channels and subtracts
        the mean, then runs the standard calibration."""
        cfg = self.config
        if getattr(cfg, "quant_mode", "none") != "int8" or self._stages is not None:
            return
        x = np.asarray(molded_like, np.float32)
        if x.ndim == 3:
            x = np.repeat(x[..., None], cfg.image_channel_count, axis=-1)
        x = x - np.asarray(cfg.mean_pixel, np.float32)
        h, w = x.shape[1:3]
        c = cfg.image_channel_count
        meta = compose_image_meta(
            0, (h, w, c), (h, w, c), (0, 0, h, w), 1.0,
            np.zeros(cfg.num_classes),
        )
        metas = np.tile(meta.astype(np.float32), (x.shape[0], 1))
        self._quantize_molded(x, metas, get_anchors(cfg, (h, w, c)))

    def dispatch_tiles_raw(self, raw: np.ndarray, limits: np.ndarray):
        """Async-dispatch detection on RAW float32 tiles with host-fitted
        zscale limits; all per-pixel preprocessing runs on-device.

        ``raw``: [B, H, W] float32 windowed FITS pixels (NaNs allowed);
        ``limits``: [B, 2] (vmin, vmax) per tile. Returns a handle for
        :meth:`collect`.
        """
        cfg = self.config
        h, w, _c = cfg.image_shape
        n_in = raw.shape[0]
        bs = cfg.batch_size
        assert n_in > 0, "dispatch_tiles_raw got an empty batch"
        assert raw.shape[1] == h and raw.shape[2] == w, (
            f"tiles {raw.shape[1:3]} != compiled input {(h, w)}"
        )
        assert n_in <= bs, f"dispatch_tiles_raw got {n_in} tiles, batch_size={bs}"
        limits = np.asarray(limits, dtype=np.float32).reshape(n_in, 2)
        if getattr(cfg, "quant_mode", "none") == "int8" and self._stages is None:
            # Host replica of _make_premold_raw's zscale->u8 chain, only to
            # build the one-time calibration batch.
            x = np.asarray(raw, np.float32).copy()
            for i in range(n_in):
                fin = np.isfinite(x[i])
                x[i][~fin] = x[i][fin].min() if fin.any() else 0.0
            lo = limits[:, 0][:, None, None]
            span = limits[:, 1][:, None, None] - lo
            x = np.where(span > 0, (x - lo) / np.where(span > 0, span, 1.0), 0.0)
            x = np.round(np.clip(x, 0.0, 1.0) * 255.0)
            self._autoquant_tiles(x)
        if n_in < bs:
            raw = np.concatenate([raw, np.repeat(raw[-1:], bs - n_in, axis=0)])
            limits = np.concatenate(
                [limits, np.repeat(limits[-1:], bs - n_in, axis=0)]
            )
        metas, anchors = self._tile_constants(h, w, _c, bs)
        out = self._tile_fn("raw")(
            self.variables,
            self._put_batch(raw.astype(np.float32)),
            self._put_batch(limits[:, 0]), self._put_batch(limits[:, 1]),
            metas, anchors,
        )
        return out, n_in, (h, w, _c)

    def dispatch_tiles(self, tiles: np.ndarray):
        """Async-dispatch detection on a batch of pre-sized tiles.

        ``tiles``: [B, H, W] (grayscale, broadcast to the model's channels
        on device) or [B, H, W, C]; (H, W) must equal the compiled input
        shape (tiles skip host resize — the mold window is the full frame).
        Returns an opaque handle for :meth:`collect`. Dispatch returns as
        soon as the device work is enqueued, so callers can overlap host
        unmolding of batch k with device inference of batch k+1.
        """
        cfg = self.config
        h, w, _c = cfg.image_shape
        n_in = tiles.shape[0]
        bs = cfg.batch_size
        assert n_in > 0, "dispatch_tiles got an empty batch"
        assert tiles.shape[1] == h and tiles.shape[2] == w, (
            f"tiles {tiles.shape[1:3]} != compiled input {(h, w)}"
        )
        assert n_in <= bs, f"dispatch_tiles got {n_in} tiles, batch_size={bs}"
        self._autoquant_tiles(tiles[:n_in])
        if n_in < bs:
            tiles = np.concatenate(
                [tiles, np.repeat(tiles[-1:], bs - n_in, axis=0)]
            )
        metas, anchors = self._tile_constants(h, w, _c, bs)
        out = self._tile_fn("u8")(
            self.variables, self._put_batch(tiles), metas, anchors
        )
        return out, n_in, (h, w, _c)

    def _tile_constants(self, h: int, w: int, c: int, bs: int):
        """Device-resident metas/anchors for the tiled fast path, cached per
        shape — re-uploading ~260 KB per dispatch through the ~100 MB/s
        tunnel violated the device-resident-inputs invariant."""
        key = (h, w, bs)
        if key not in self._tile_consts:
            cfg = self.config
            meta = compose_image_meta(
                0, (h, w, c), (h, w, c), (0, 0, h, w), 1.0, np.zeros(cfg.num_classes)
            )
            metas_np = np.tile(meta.astype(np.float32), (bs, 1))
            anchors_np = get_anchors(cfg, (h, w, c))
            if self.mesh is not None:
                metas = jax.device_put(metas_np, self._data)
                anchors = jax.device_put(anchors_np, self._rep)
            else:
                metas = jax.device_put(metas_np)
                anchors = jax.device_put(anchors_np)
            self._tile_consts[key] = (metas, anchors)
        return self._tile_consts[key]

    def fetch(self, handle):
        """Device->host fetch half of :meth:`collect` (blocks on the device
        queue + download). Split out so pipeline benchmarks can attribute
        channel/device wait separately from host unmold CPU."""
        out, n_in, shape = handle
        detections, masks = self._unpack(out)
        return detections, masks, n_in, shape

    def unmold_fetched(self, fetched) -> List[Dict]:
        """Host-CPU unmold half of :meth:`collect` (no device I/O)."""
        detections, masks, n_in, shape = fetched
        window = (0, 0, shape[0], shape[1])
        results = []
        for i in range(n_in):
            rois, class_ids, scores, full_masks = self.unmold_detections(
                detections[i], masks[i], shape, shape, window
            )
            results.append(
                {"rois": rois, "class_ids": class_ids, "scores": scores,
                 "masks": full_masks}
            )
        return results

    def collect(self, handle) -> List[Dict]:
        """Fetch + unmold a :meth:`dispatch_tiles` batch."""
        return self.unmold_fetched(self.fetch(handle))

    def detect_tiles(self, tiles: np.ndarray) -> List[Dict]:
        """Synchronous tiled fast path (dispatch + collect)."""
        return self.collect(self.dispatch_tiles(tiles))

    # ------------------------------------------------------------ detect
    def detect(self, images: Sequence[np.ndarray], verbose: int = 0) -> List[Dict]:
        """Run detection; returns per-image dicts {rois, class_ids, scores,
        masks} (reference contract: mrcnn/model.py:2689-2694)."""
        cfg = self.config
        n_in = len(images)
        bs = cfg.batch_size
        assert n_in <= bs, f"detect got {n_in} images but batch_size={bs}"
        molded, metas, windows = self.mold_inputs(images)
        if n_in < bs:  # pad tail to the compiled batch
            reps = bs - n_in
            molded = np.concatenate([molded, np.repeat(molded[-1:], reps, axis=0)])
            metas = np.concatenate([metas, np.repeat(metas[-1:], reps, axis=0)])

        image_shape = molded[0].shape
        anchors_np = get_anchors(cfg, image_shape)
        self._maybe_autoquant(molded, metas, anchors_np)
        anchors = (
            jax.device_put(anchors_np, self._rep)
            if self.mesh is not None
            else jnp.asarray(anchors_np)
        )
        out = self._fn(
            self.variables, self._put_batch(molded), self._put_batch(metas), anchors
        )
        detections = np.asarray(out.detections)
        masks = np.asarray(out.masks)

        results = []
        for i in range(n_in):
            rois, class_ids, scores, full_masks = self.unmold_detections(
                detections[i], masks[i], images[i].shape, molded[i].shape, windows[i]
            )
            results.append(
                {
                    "rois": rois,
                    "class_ids": class_ids,
                    "scores": scores,
                    "masks": full_masks,
                }
            )
        if verbose:
            logger.info("detected %s", [len(r["class_ids"]) for r in results])
        return results


def build_detector(
    config: Config,
    weights_path: Optional[str] = None,
    exclude: Optional[Sequence[str]] = None,
    seed: int = 0,
    mesh=None,
) -> Detector:
    """Construct model + variables (optionally restoring weights by name
    with exclusions, reference: mrcnn/model.py:2197-2239).

    When ``config.num_devices > 1`` and no explicit ``mesh`` is given, a
    1-D data mesh over the local devices is created so detect shards the
    batch across all of them (reference ParallelModel wiring:
    mrcnn/model.py:2161-2165)."""
    from ..models.mask_rcnn import init_model
    from ..train.checkpoints import restore_weights

    if mesh is None and config.num_devices > 1:
        from ..parallel.mesh import make_mesh

        avail = len(jax.devices())
        if avail >= config.num_devices:
            mesh = make_mesh(n_devices=config.num_devices)
        else:
            # Shrink to the devices that exist instead of compiling the
            # full global batch (images_per_device * num_devices) onto
            # one chip — batch 64 on a single v5e degrades throughput
            # superlinearly via the NMS matrices and risks HBM OOM.
            logger.warning(
                "config.num_devices=%d but only %d local devices — "
                "shrinking to num_devices=%d (batch %d -> %d)",
                config.num_devices, avail, avail,
                config.batch_size, config.images_per_device * avail,
            )
            config = config.replace(num_devices=avail)
            if avail > 1:
                mesh = make_mesh(n_devices=avail)
    model, variables = init_model(config, jax.random.PRNGKey(seed))
    if weights_path:
        variables, _, _ = restore_weights(variables, weights_path, exclude=exclude)
    return Detector(config, model, variables, mesh=mesh)
