"""AOT serving artifacts: compile once, serialize, run without model code.

The reference's inference story stops at a Python object over live torch
modules (upstream:network/inferer.py; SURVEY.md §2.1 #20) — every serving
process must carry the model code, the checkpoint, and pay a fresh trace.
The TPU-native shape is `jax.export`: trace + lower each serving entry
point ONCE, bake the trained params into the StableHLO as constants, and
serialize.  A serving host then needs only jax — no pytorch_glow_tpu
model code, no checkpoint files, no re-trace — and XLA recompiles the
portable StableHLO for whatever chips it has.

Artifact layout (one directory):

    manifest.json      — format version, shapes/dtypes per function, config
    <name>.jaxexport   — serialized jax.export blob per entry point

Entry points (B is the export batch, or a symbolic dimension with
batch_size="dynamic" — one artifact then serves any batch size):

    sample(n u8[B], seed u32[], temperature f32[]) -> uint8 images
        (the first argument is a dummy carrier whose length IS the batch)
    sample_y(seed, temperature, labels i32[B])  -> uint8 images  (y-cond only)
    encode(x u8[B,H,W,C])                       -> z_L f32
    decode(z f32, seed, temperature)            -> uint8 images
    reconstruct(x u8)                           -> uint8 images (exact z path)
    nll(x u8)                                   -> f32[B] bits/dim
    nll_elbo(x u8, seed u32[])                  -> f32[B] (VALID 1-draw bound)
    nll_y(x u8, labels i32[B])                  -> f32[B]        (y-cond only)

By default the artifact is exported from the portable XLA flow-step path
(`flowstep_impl="xla"`), so the same blob lowers on TPU and CPU; pass
`keep_kernels=True` to export the Mosaic fused-kernel path for a
TPU-only artifact.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

FORMAT_VERSION = 1
_MANIFEST = "manifest.json"


# ---------------------------------------------------------------------------
# Export
# ---------------------------------------------------------------------------


def _serving_fns(params, cfg, batch_size):
    """name -> (pure fn over runtime args, example arg specs).  `params`
    and `cfg` are closed over: export bakes them into the artifact.

    batch_size="dynamic" uses a jax.export symbolic batch dimension, so ONE
    artifact serves any batch size; `sample` then takes a (b,)-shaped dummy
    carrier as its first argument (the only way a no-array-input entry
    point can receive a dynamic dimension)."""
    import jax
    import jax.numpy as jnp

    from pytorch_glow_tpu.models import glow

    h, w, c = cfg.image_shape
    if batch_size == "dynamic":
        from jax import export as jexport

        (b,) = jexport.symbolic_shape("b")
    else:
        b = batch_size
    x_spec = jax.ShapeDtypeStruct((b, h, w, c), jnp.uint8)
    z_spec = jax.ShapeDtypeStruct((b, *cfg.final_latent_shape), jnp.float32)
    n_spec = jax.ShapeDtypeStruct((b,), jnp.uint8)
    seed_spec = jax.ShapeDtypeStruct((), jnp.uint32)
    temp_spec = jax.ShapeDtypeStruct((), jnp.float32)

    def _onehot(labels):
        return jax.nn.one_hot(labels, cfg.y_classes, dtype=jnp.float32)

    def sample(n_like, seed, temperature):
        imgs = glow.sample(params, jax.random.key(seed), cfg,
                           n=n_like.shape[0], temperature=temperature)
        return glow.postprocess(imgs, cfg)

    def encode(x):
        z, _, _, _ = glow.encode(params, glow.preprocess(x, cfg), cfg)
        return z

    def decode(z, seed, temperature):
        imgs = glow.decode(params, z, cfg, rng=jax.random.key(seed),
                           temperature=temperature)
        return glow.postprocess(imgs, cfg)

    def reconstruct(x):
        imgs = glow.reconstruct(params, glow.preprocess(x, cfg), cfg)
        return glow.postprocess(imgs, cfg)

    def nll(x):
        return glow.log_prob(params, glow.preprocess(x, cfg), cfg)["nll"]

    def nll_elbo(x, seed):
        # The VALID single-draw discrete-NLL bound (the published eval
        # protocol; glow.nll_bound) — final bits/dim claims can be produced
        # on model-code-free serving hosts.
        return glow.nll_bound(params, glow.preprocess(x, cfg), cfg,
                              jax.random.key(seed), samples=1, bound="elbo")

    fns = {
        "sample": (sample, (n_spec, seed_spec, temp_spec)),
        "encode": (encode, (x_spec,)),
        "decode": (decode, (z_spec, seed_spec, temp_spec)),
        "reconstruct": (reconstruct, (x_spec,)),
        "nll": (nll, (x_spec,)),
        "nll_elbo": (nll_elbo, (x_spec, seed_spec)),
    }

    if cfg.y_condition:
        labels_spec = jax.ShapeDtypeStruct((b,), jnp.int32)

        def sample_y(seed, temperature, labels):
            imgs = glow.sample(params, jax.random.key(seed), cfg,
                               n=labels.shape[0], temperature=temperature,
                               y_onehot=_onehot(labels))
            return glow.postprocess(imgs, cfg)

        def nll_y(x, labels):
            return glow.log_prob(params, glow.preprocess(x, cfg), cfg,
                                 y_onehot=_onehot(labels))["nll"]

        fns["sample_y"] = (sample_y, (seed_spec, temp_spec, labels_spec))
        fns["nll_y"] = (nll_y, (x_spec, labels_spec))

    return fns


def export_artifact(
    params,
    cfg,
    out_dir: str,
    batch_size: int | str = 16,
    functions: tuple[str, ...] | None = None,
    platforms: tuple[str, ...] | None = None,
    keep_kernels: bool = False,
    mesh=None,
) -> dict:
    """Export serving entry points for a trained model; returns the manifest.

    batch_size: fixed serving batch, or "dynamic" for a symbolic batch
    dimension — one artifact then serves ANY batch size (incompatible with
    mesh, whose shardings need a concrete batch).
    platforms: lowering targets recorded in the blobs (e.g. ("tpu", "cpu"));
    None = the current default backend only.  keep_kernels: export with the
    config's Pallas fused kernels instead of forcing the portable XLA path.
    mesh: a jax.sharding.Mesh with a "data" axis — exports SPMD entry
    points with the batch dimension sharded over it (pod serving); the
    serving context must then have the same device count, and the loader
    re-places inputs onto the recorded mesh.
    """
    import jax
    from jax import export as jexport
    from jax.sharding import NamedSharding, PartitionSpec

    if not keep_kernels and cfg.flowstep_impl != "xla":
        cfg = dataclasses.replace(cfg, flowstep_impl="xla")

    fns = _serving_fns(params, cfg, batch_size)
    if functions is not None:
        unknown = set(functions) - set(fns)
        if unknown:
            raise ValueError(f"unknown serving functions {sorted(unknown)}; "
                             f"available: {sorted(fns)}")
        fns = {k: fns[k] for k in functions}

    if mesh is not None:
        if batch_size == "dynamic":
            raise ValueError("batch_size='dynamic' is incompatible with mesh "
                             "export (shardings need a concrete batch)")
        if "data" not in mesh.axis_names:
            raise ValueError(f"mesh {mesh.axis_names} has no 'data' axis")
        if batch_size % mesh.shape["data"]:
            raise ValueError(f"batch_size {batch_size} must divide over "
                             f"data axis of size {mesh.shape['data']}")

    def _spec(arg):
        # batch-carrying args/outputs shard over "data"; scalars replicate.
        return PartitionSpec("data") if arg.ndim else PartitionSpec()

    os.makedirs(out_dir, exist_ok=True)
    manifest: dict = {
        "format_version": FORMAT_VERSION,
        "jax_version": jax.__version__,
        "batch_size": batch_size,
        "image_shape": list(cfg.image_shape),
        "final_latent_shape": list(cfg.final_latent_shape),
        "y_condition": cfg.y_condition,
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "mesh": None if mesh is None else {
            "shape": [mesh.shape[a] for a in mesh.axis_names],
            "axis_names": list(mesh.axis_names),
        },
        "glow_config": dataclasses.asdict(cfg),
        "functions": {},
    }
    for name, (fn, args) in fns.items():
        if mesh is None:
            jitted = jax.jit(fn)
            arg_specs = None
        else:
            in_sh = tuple(NamedSharding(mesh, _spec(a)) for a in args)
            out_sh = jax.tree.map(
                lambda a: NamedSharding(mesh, _spec(a)),
                jax.eval_shape(fn, *args))
            jitted = jax.jit(fn, in_shardings=in_sh, out_shardings=out_sh)
            arg_specs = [list(_spec(a)) for a in args]
        exp = jexport.export(jitted,
                             platforms=list(platforms) if platforms else None)(*args)
        blob = exp.serialize()
        with open(os.path.join(out_dir, f"{name}.jaxexport"), "wb") as f:
            f.write(blob)
        manifest["functions"][name] = {
            # symbolic dims (dynamic batch) serialize as their name, "b"
            "args": [{"shape": [d if isinstance(d, int) else str(d)
                                for d in a.shape],
                      "dtype": str(a.dtype)} for a in args],
            "arg_specs": arg_specs,
            "bytes": len(blob),
        }
    manifest = json.loads(json.dumps(manifest))  # tuples -> lists, as loaded
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


# ---------------------------------------------------------------------------
# Load / serve (model-code-free: needs only jax + this loader)
# ---------------------------------------------------------------------------


def _warm_ffi_targets() -> None:
    """Register XLA:CPU LAPACK FFI handlers before running deserialized
    StableHLO.  jax 0.9.0 registers `lapack_*_ffi` custom-call targets
    lazily, when a linalg op is TRACED in-process — a model-code-free
    serving process that only deserializes and calls an export whose graph
    contains one (our decode path lowers the LU invconv's reverse as
    `lapack_strsm_ffi` on CPU) SIGSEGVs through the unregistered target.
    Tracing tiny solves here (never executed) makes registration explicit.
    Harmless on TPU, where the solve lowers natively and the targets go
    unused."""
    try:
        import jax
        import jax.numpy as jnp
        from jax.lax import linalg as lxl

        a = jnp.eye(2)
        jax.jit(lambda m: lxl.triangular_solve(m, a, left_side=True,
                                               lower=True)).lower(a)
        jax.jit(lxl.lu).lower(a)
        jax.jit(lambda m: lxl.qr(m, full_matrices=False)).lower(a)
    except Exception:  # registration warmup must never block serving
        pass


class ServedModel:
    """Callable view over an exported artifact directory.

    Deserialization and compilation are lazy and cached per entry point;
    calls are jitted executions of the deserialized StableHLO (recompiled
    by XLA for the local chips — no Python model code involved).
    """

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, _MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest["format_version"] > FORMAT_VERSION:
            raise ValueError(
                f"artifact format {self.manifest['format_version']} is newer "
                f"than this loader ({FORMAT_VERSION})")
        self.batch_size = self.manifest["batch_size"]
        self._fns: dict = {}
        self._mesh = None
        _warm_ffi_targets()

    @property
    def functions(self) -> list[str]:
        return sorted(self.manifest["functions"])

    def _serving_mesh(self):
        """Rebuild the export-time mesh topology over the local devices."""
        if self._mesh is None:
            import jax
            from jax.sharding import Mesh

            m = self.manifest["mesh"]
            n = int(np.prod(m["shape"]))
            if len(jax.devices()) < n:
                raise ValueError(
                    f"artifact was exported for a {m['shape']} mesh "
                    f"({n} devices); only {len(jax.devices())} available")
            self._mesh = Mesh(
                np.asarray(jax.devices()[:n]).reshape(m["shape"]),
                tuple(m["axis_names"]))
        return self._mesh

    def fn(self, name: str):
        """The compiled callable for one entry point.  For SPMD artifacts
        (manifest "mesh" set) the callable re-places each argument onto the
        recorded sharding over the local devices first."""
        if name not in self._fns:
            import jax
            from jax import export as jexport

            meta = self.manifest["functions"].get(name)
            if meta is None:
                raise KeyError(f"artifact has no function '{name}' "
                               f"(has: {self.functions})")
            with open(os.path.join(self.path, f"{name}.jaxexport"), "rb") as f:
                exp = jexport.deserialize(f.read())
            call = jax.jit(exp.call)
            if self.manifest.get("mesh") is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                mesh = self._serving_mesh()
                shardings = tuple(
                    NamedSharding(mesh, PartitionSpec(*spec))
                    for spec in meta["arg_specs"])
                inner = call

                def call(*args, _inner=inner, _sh=shardings):
                    placed = tuple(jax.device_put(a, s)
                                   for a, s in zip(args, _sh))
                    return _inner(*placed)

            self._fns[name] = call
        return self._fns[name]

    # -- convenience wrappers (numpy in/out) --------------------------------

    def sample(self, seed: int = 0, temperature: float = 0.7,
               labels=None, n: int | None = None) -> np.ndarray:
        """n: batch size for "dynamic" artifacts (fixed artifacts always
        produce their exported batch)."""
        import jax.numpy as jnp

        seed = jnp.uint32(seed)
        temperature = jnp.float32(temperature)
        if labels is not None:
            out = self.fn("sample_y")(seed, temperature,
                                      jnp.asarray(labels, jnp.int32))
        else:
            if n is None:
                n = self.batch_size if self.batch_size != "dynamic" else 16
            carrier = jnp.zeros((n,), jnp.uint8)
            out = self.fn("sample")(carrier, seed, temperature)
        return np.asarray(out)

    def encode(self, images) -> np.ndarray:
        import jax.numpy as jnp

        return np.asarray(self.fn("encode")(jnp.asarray(images, jnp.uint8)))

    def decode(self, z, seed: int = 0, temperature: float = 0.0) -> np.ndarray:
        import jax.numpy as jnp

        return np.asarray(self.fn("decode")(
            jnp.asarray(z, jnp.float32), jnp.uint32(seed),
            jnp.float32(temperature)))

    def reconstruct(self, images) -> np.ndarray:
        import jax.numpy as jnp

        return np.asarray(self.fn("reconstruct")(jnp.asarray(images, jnp.uint8)))

    def nll(self, images, labels=None) -> np.ndarray:
        import jax.numpy as jnp

        x = jnp.asarray(images, jnp.uint8)
        if labels is not None:
            return np.asarray(self.fn("nll_y")(x, jnp.asarray(labels, jnp.int32)))
        return np.asarray(self.fn("nll")(x))

    def nll_elbo(self, images, seed: int = 0) -> np.ndarray:
        """Valid single-draw discrete-NLL bound (the published protocol)."""
        import jax.numpy as jnp

        return np.asarray(
            self.fn("nll_elbo")(jnp.asarray(images, jnp.uint8), jnp.uint32(seed))
        )


def load_artifact(path: str) -> ServedModel:
    return ServedModel(path)
