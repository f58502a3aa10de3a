"""Headless CLI.

Parity with the reference's entry point (tiler.lpr:49-73): a single
settings-file argument runs the full encode. Extra subcommands cover the
GUI-only capabilities (preview/export/inspect, main.pas:15-163):

  tiler-tpu <settings.ini>              full encode (reference CLI parity)
  tiler-tpu encode -i IN -o OUT [...]   encode with flag overrides
  tiler-tpu decode IN.gtm OUT.y4m       decode to Y4M (or PNG dir)
  tiler-tpu info IN.gtm                 header / keyframe / settings dump
  tiler-tpu selftest                    math invariants (TTilingEncoder.Test)
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


class DeviceWatchdog:
    """Failure detection for unreachable device backends (SURVEY section 5).

    A dead TPU tunnel makes backend init block FOREVER inside the first
    dispatch with zero CPU use and zero output — indistinguishable, from
    the console, from a long first compile. This watchdog distinguishes
    them: when no step progress lands for `stall_s`, it probes the
    backend from a DISPOSABLE child process (the probe also blocks if
    the backend is dead — the child can be abandoned, the main process
    can't). A healthy probe means "slow compile, keep waiting"; a failed
    probe prints the diagnosis and the host-only remedy once.

    Diagnostic-only by design: it never kills the encode (a transient
    tunnel blip mid-recovery would otherwise abort legitimate runs)."""

    def __init__(self, stall_s: float = 150.0, probe_timeout: float = 90.0):
        import threading
        import time as _t

        self.stall_s = stall_s
        self.probe_timeout = probe_timeout
        self._last = _t.time()
        self._warned = False
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def tick(self, *_a, **_k):
        import time as _t

        self._last = _t.time()

    def __enter__(self):
        if not self._thread.is_alive():  # idempotent: may wrap an import
            self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()

    @staticmethod
    def _backend_alive(timeout: float) -> bool:
        import subprocess

        code = ("import jax,jax.numpy as jnp;"
                "x=jnp.ones((64,64));print(float((x@x).sum()))")
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=timeout, capture_output=True)
            return r.returncode == 0
        except Exception:
            return False

    def _check_once(self):
        import time as _t

        if self._warned or _t.time() - self._last < self.stall_s:
            return
        if self._backend_alive(self.probe_timeout):
            self.tick()  # device healthy: just a slow compile
            return
        self._warned = True
        print(
            f"tiler-tpu: no progress for {int(_t.time() - self._last)}s "
            "and a child-process device probe FAILED. Likely causes: "
            "(a) the accelerator tunnel/backend is unreachable (init "
            "blocks forever — rerun host-only with "
            "TILER_TPU_PLATFORM=cpu), or (b) this runtime grants the "
            "device exclusively to the running encode, in which case "
            "this is a long first compile — if step logs resume, "
            "ignore this warning.",
            file=sys.stderr, flush=True,
        )

    def _run(self):
        while not self._stop.wait(30.0):
            self._check_once()


def _apply_platform_override():
    """Honor TILER_TPU_PLATFORM (e.g. "cpu") before any pipeline import.

    Some TPU launch environments pin jax's platform list via
    jax.config at interpreter start, which silently overrides the
    JAX_PLATFORMS env var; a config-level update is the only reliable
    host-only escape hatch (useful for decode/info/preview on machines
    without a reachable chip)."""
    plat = os.environ.get("TILER_TPU_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def _encoder_from_settings(path_or_none, overrides):
    from .config import EncoderSettings

    s = EncoderSettings.from_ini(path_or_none) if path_or_none else EncoderSettings()
    for k, v in overrides.items():
        if v is not None:
            setattr(s, k, v)
    return s


def cmd_encode(args):
    # watchdog wraps the import: a dead backend blocks inside the first
    # module-level jit dispatch (see DeviceWatchdog)
    _wd = DeviceWatchdog()
    _wd.__enter__()
    from .pipeline.encoder import Encoder, STEPS

    settings = _encoder_from_settings(
        args.settings,
        dict(
            input_file_name=args.input,
            output_file_name=args.output,
            palette_count=args.palette_count,
            palette_size=args.palette_size,
            motion_predict_radius=args.radius,
            global_tiling_quality_based_tile_count=args.quality,
            frame_count=args.frames,
        ),
    )
    mesh = "auto" if args.mesh == "auto" else None
    if args.resume:
        enc = Encoder.load_checkpoint(args.resume)
        enc.settings = settings if args.settings else enc.settings
        if mesh:
            import jax

            from .parallel import make_mesh

            enc.mesh = make_mesh() if jax.device_count() > 1 else None
    else:
        enc = Encoder(settings, mesh=mesh)

    # step-range execution (GUI start/end step combos, main.pas:406-443)
    with _wd as wd:
        orig_log = enc.log
        enc.log = lambda *a: (wd.tick(), orig_log(*a))
        if args.steps:
            a, colon, b = args.steps.partition(":")
            a = a or STEPS[0]
            # "a:b" is a range (open ends default to first/last step);
            # a bare "a" means exactly that one step
            b = b or (STEPS[-1] if colon else a)
            i0, i1 = STEPS.index(a), STEPS.index(b)
            for name in STEPS[i0 : i1 + 1]:
                if name == "load":
                    enc.load_video()
                elif name == "save":
                    enc.save()
                else:
                    getattr(enc, name)()
        else:
            enc.run_all()
    if args.checkpoint:
        enc.save_checkpoint(args.checkpoint)
    if args.export_y4m:
        from .bitstream.gtm import GTMDecoder
        from .io.export import write_y4m

        frames = GTMDecoder(settings.output_file_name).decode_frames()
        write_y4m(args.export_y4m, [f[..., :3] for f in frames], enc.state.fps)
    if args.export_input_y4m:
        import numpy as np

        from .io.export import write_y4m

        # deferred pipelined ingest keeps frames in pieces until a
        # consumer materializes them; a step range ending at load would
        # otherwise export from frames_rgb=None
        enc.state.ensure_ingest()
        write_y4m(args.export_input_y4m, np.asarray(enc.state.frames_rgb), enc.state.fps)
    if args.export_pngs:
        from .bitstream.gtm import GTMDecoder
        from .io.export import write_pngs

        frames = GTMDecoder(settings.output_file_name).decode_frames()
        write_pngs(args.export_pngs, frames, enc.state.palettes_rgb)
    return 0


def cmd_decode(args):
    from .bitstream.gtm import GTMDecoder

    dec = GTMDecoder(args.input)
    frames = dec.decode_frames()
    fps = 24.0
    if dec.header and dec.header.get("keyframes"):
        pass
    if args.output.endswith(".y4m"):
        from .io.export import write_y4m

        write_y4m(args.output, [f[..., :3] for f in frames], fps)
    else:
        from .io.export import write_pngs

        write_pngs(args.output, frames)
    print(f"decoded {len(frames)} frames")
    return 0


def cmd_info(args):
    from .bitstream.gtm import GTMReader, parse_header

    raw = open(args.input, "rb").read()
    h = parse_header(raw)
    print(json.dumps(h, indent=2))
    if args.full:
        g = GTMReader.read(raw)
        print(f"tiles: {g.tile_count}, palettes: {0 if g.palettes_rgb is None else len(g.palettes_rgb)}, "
              f"palette_size: {g.palette_size}, frames: {len(g.frames)}")
        print("--- embedded settings ---")
        print(g.settings_text)
    return 0


def cmd_selftest(args):
    """Math invariants, mirroring TTilingEncoder.Test
    (tilingencoder.pas:3847-3902)."""
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from .ops import color, dct

    rng = np.random.RandomState(0x42381337 & 0x7FFFFFFF)
    rgb = rng.randint(0, 256, (10000, 3)).astype(np.float64)
    assert np.array_equal(np.asarray(color.yuv_to_rgb(color.rgb_to_yuv(jnp.asarray(rgb)))), rgb), "YUV"
    assert np.array_equal(np.asarray(color.lab_to_rgb(color.rgb_to_lab(jnp.asarray(rgb)))), rgb), "LAB"
    i = np.arange(8)[:, None]
    j = np.arange(8)[None, :]
    t = jnp.asarray(np.stack([i * 8 + 0 * j, j * 32 + 0 * i, i * j], -1).astype(np.float64))
    for mode in ("dct", "weighted_dct", "wavelets"):
        back = dct.inv_tile_features(dct.tile_features(t, mode=mode), mode=mode)
        assert np.array_equal(np.asarray(back), np.asarray(t)), mode
    print("selftest ok")
    return 0


def cmd_preview(args):
    from .preview import preview_gtm

    srv = preview_gtm(args.input, input_path=args.video, port=args.port)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()
    return 0


def main(argv=None):
    _apply_platform_override()
    argv = list(sys.argv[1:] if argv is None else argv)
    # reference parity: single argument = settings file, run all
    if len(argv) == 1 and not argv[0].startswith("-") and argv[0] not in (
        "encode", "decode", "info", "selftest", "preview",
    ):
        # the watchdog must wrap the IMPORT too: a dead backend blocks
        # inside the first module-level jit dispatch, before any step runs
        with DeviceWatchdog() as wd:
            from .pipeline.encoder import Encoder

            enc = Encoder(_encoder_from_settings(argv[0], {}),
                          log=lambda *a: (wd.tick(), print(*a, flush=True)))
            enc.run_all()
        return 0

    p = argparse.ArgumentParser(prog="tiler-tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    e = sub.add_parser("encode")
    e.add_argument("-i", "--input", help="video/y4m/image-sequence path")
    e.add_argument("-o", "--output", help="output .gtm path")
    e.add_argument("-s", "--settings", help="settings .ini")
    e.add_argument("--palette-count", type=int, dest="palette_count")
    e.add_argument("--palette-size", type=int, dest="palette_size")
    e.add_argument("--radius", type=int)
    e.add_argument("--quality", type=float)
    e.add_argument("--frames", type=int)
    e.add_argument("--export-y4m")
    e.add_argument("--export-input-y4m")  # GenerateY4M(AInput=True) parity
    e.add_argument("--export-pngs")
    e.add_argument("--mesh", choices=("none", "auto"), default="none",
                   help="auto: shard the corpus/data axes over all visible "
                        "devices (jax.sharding.Mesh); no-op on 1 device")
    e.add_argument("--steps", help="contiguous step range, e.g. load:reduce")
    e.add_argument("--checkpoint", help="write encoder state after the run")
    e.add_argument("--resume", help="resume from a checkpoint file")
    e.set_defaults(fn=cmd_encode)

    d = sub.add_parser("decode")
    d.add_argument("input")
    d.add_argument("output")
    d.set_defaults(fn=cmd_decode)

    i = sub.add_parser("info")
    i.add_argument("input")
    i.add_argument("--full", action="store_true")
    i.set_defaults(fn=cmd_info)

    t = sub.add_parser("selftest")
    t.set_defaults(fn=cmd_selftest)

    v = sub.add_parser("preview", help="HTTP inspector over a .gtm "
                       "(the GUI's render pages + PSNR readout)")
    v.add_argument("input")
    v.add_argument("--video", help="source video (enables the input page)")
    v.add_argument("--port", type=int, default=8080)
    v.set_defaults(fn=cmd_preview)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
