"""Probe: ONE Pallas kernel for a whole MBConv block (expand+dw/s2+project).

Follow-up to probe_int8_conv (ledger #26): that probe showed a single
conv+epilogue already runs near the measured streaming floor, so the
remaining headroom in the 22.5 ms conv section is NOT per-op emitter
quality — it is the INTER-op HBM traffic: block_1's expand writes a
1.26 GB int8 tensor that the dw conv immediately re-reads, and the dw
output is re-read by project. Fusing the whole block into one kernel
keeps those intermediates in VMEM: per image the fused block reads 1.6 MB
(16ch @320^2 int8) and writes 0.8 MB (32ch-padded @160^2 int8) instead of
~10 MB of intermediate traffic.

Design (TPU-first, not a translation of the conv graph):
- input is pre-arranged in SPACE-TO-DEPTH PARITY-PLANAR form
  (B, 4par*16ch, 160*160) int8: the stride-2 3x3 depthwise becomes 9
  UNSTRIDED shifted MACs across parity planes (lane rolls by {1,160,161}
  + edge masks) — no strided lane access, the thing Mosaic is worst at.
- expand / project are planar MXU matmuls (Cout,Cin)@(Cin,P) with pixels
  dense in lanes (the probe_int8_conv layout that measured at 1.07x the
  streaming floor).
- all requant epilogues (f32 scale+bias, relu6, round/clip to int8) stay
  in VMEM between the three ops.
- dw MACs run in f32: |int8*int8*9| < 2^24, so f32 accumulation is EXACT
  (verified against an int32 reference in the unit test).

Correctness: bit-exact vs a jnp planar reference implementing the same
math (interpret mode in tests, device in the CLI). Perf: measured against
(a) XLA running the engine-style NHWC int8 conv chain (what the serving
program does today) and (b) the elementwise streaming floor on the fused
kernel's in+out traffic.

CLI: python -m tpucenterface.bench.probe_fused_block [--batch 128]
     [--hw-in 320] [--cin 16] [--cmid 96] [--cout 24]
"""

from __future__ import annotations

import json

HW_OUT_DEFAULT = 160


def s2_halo(hw_out: int) -> int:
    """Halo lanes for the s2 kernel: >= hw_out+1 (tap starts stay >= 0),
    rounded to a 128-lane tile so the input block's last dim satisfies
    Mosaic's divisible-by-128 block constraint."""
    return -(-(hw_out + 1) // 128) * 128


def _plane_index(pr: int, pc: int) -> int:
    """Parity plane order along the channel-block dim: (pr, pc) -> 0..3."""
    return pr * 2 + pc


def nhwc_to_parity_planar(x):
    """(B, H, W, C) -> (B, 4*C, (H/2)*(W/2)): s2d parity planes, flattened.

    Plane p=(pr,pc) holds X[2r+pr, 2c+pc]. Channel-block dim is ordered
    (parity-major, channel-minor): row p*C + ch.
    """
    import jax.numpy as jnp

    b, h, w, c = x.shape
    hh, ww = h // 2, w // 2
    x = x.reshape(b, hh, 2, ww, 2, c)
    # (B, pr, pc, C, hh, ww)
    x = x.transpose(0, 2, 4, 5, 1, 3)
    return x.reshape(b, 4 * c, hh * ww)


def planar_to_nhwc(y, hh: int, ww: int):
    """(B, C, hh*ww) -> (B, hh, ww, C)."""
    b, c, _ = y.shape
    return y.reshape(b, c, hh, ww).transpose(0, 2, 3, 1)


def _dw_taps(e_planes, wd, hw_out: int):
    """Planar stride-2 3x3 depthwise via parity-plane shifts.

    e_planes: dict (pr,pc) -> (C, P) f32 (P = hw_out^2, row-major flat)
    wd: (3, 3, C) f32 tap weights
    returns (C, P) f32 accumulator (exact: products < 2^24)
    """
    import jax.numpy as jnp

    c, p = e_planes[(0, 0)].shape
    col = jnp.arange(p, dtype=jnp.int32) % hw_out
    row = jnp.arange(p, dtype=jnp.int32) // hw_out
    mask_col0 = (col == 0)
    mask_row0 = (row == 0)

    def shifted(plane, dr: int, dc: int):
        """plane value at (i-dr, j-dc) with zeros off-edge (dr,dc in {0,1})."""
        t = plane
        if dr or dc:
            t = jnp.roll(t, dr * hw_out + dc, axis=1)
        if dc:
            t = jnp.where(mask_col0[None, :], 0.0, t)
        if dr:
            t = jnp.where(mask_row0[None, :], 0.0, t)
        return t

    # tap (di, dj) of the 320-space 3x3/s2 conv, SAME padding:
    # rows {2i-1, 2i, 2i+1} -> (plane pr, row shift dr): di=0 -> (1, 1),
    # di=1 -> (0, 0), di=2 -> (1, 0); same map for columns.
    pmap = {0: (1, 1), 1: (0, 0), 2: (1, 0)}
    acc = jnp.zeros((c, p), jnp.float32)
    for di in range(3):
        pr, dr = pmap[di]
        for dj in range(3):
            pc_, dc = pmap[dj]
            w_tap = wd[di, dj][:, None]  # (C, 1)
            acc = acc + w_tap * shifted(e_planes[(pr, pc_)], dr, dc)
    return acc


def fused_block_ref(
    x_planar,  # (B, 4*Cin, P) int8
    we, e_scale, e_bias, e_inv_sdw,     # (Cmid,Cin) i8, (Cmid,1) f32 x3
    wd, d_scale, d_bias, d_inv_sproj,   # (3,3,Cmid) i8->f32, (Cmid,1) f32 x3
    wp, p_scale, p_bias,                # (Cout_pad,Cmid) i8, (Cout_pad,1) f32
    hw_out: int = HW_OUT_DEFAULT,
):
    """jnp reference of the fused block, planar in/planar out (B,Cout_pad,P)."""
    import jax
    import jax.numpy as jnp

    b, c4, p = x_planar.shape
    cin = c4 // 4
    cmid = we.shape[0]

    def one(img):  # (4*Cin, P) int8
        e_planes = {}
        for pr in range(2):
            for pc in range(2):
                sl = img[_plane_index(pr, pc) * cin:][:cin]
                acc = jax.lax.dot_general(
                    we, sl, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )  # (Cmid, P)
                y = acc.astype(jnp.float32) * e_scale + e_bias
                y = jnp.clip(y, 0.0, 6.0)  # relu6
                q = jnp.clip(jnp.round(y * e_inv_sdw), -127.0, 127.0)
                e_planes[(pr, pc)] = q  # keep f32 (exact int values)
        accd = _dw_taps(
            e_planes, wd.astype(jnp.float32).reshape(3, 3, cmid), hw_out
        )
        yd = accd * d_scale + d_bias
        yd = jnp.clip(yd, 0.0, 6.0)
        qd = jnp.clip(jnp.round(yd * d_inv_sproj), -127.0, 127.0)
        accp = jax.lax.dot_general(
            wp, qd.astype(jnp.int8), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        yp = accp * p_scale + p_bias  # linear (no act on project)
        return jnp.clip(jnp.round(yp), -127.0, 127.0).astype(jnp.int8)

    return jax.vmap(one)(x_planar)


def make_fused_block_kernel(
    b: int, cin: int, cmid: int, cout_pad: int,
    hw_out: int = HW_OUT_DEFAULT, row_band: int = 20,
    interpret: bool = False,
):
    """Pallas kernel: grid (B, n_bands); each step computes `row_band` output
    rows of one image end-to-end (expand -> dw/s2 -> project) in VMEM.

    Bands need one halo row above in the odd-row parity planes; the input
    block therefore covers rows [r0-1, r0+row_band) of every parity plane
    (flat lanes [l0-2*hw_out, l0+row_band*hw_out)), loaded via a band
    overlap in the index map — Pallas blocks are disjoint per spec, so the
    halo comes from loading (row_band+halo_rows) rows with a band-granular
    index map on a halo-padded input laid out by `pad_bands`.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p_band = row_band * hw_out
    n_bands = hw_out // row_band
    assert hw_out % row_band == 0
    halo = s2_halo(hw_out)
    p_blk = p_band + halo

    def kernel(we_r, es_r, eb_r, ei_r, wd_r, ds_r, db_r, di_r,
               wp_r, ps_r, pb_r, x_r, out_r):
        band = pl.program_id(1)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, p_band), 1) % hw_out
        rowg = jax.lax.broadcasted_iota(jnp.int32, (1, p_band), 1) // hw_out
        mask_col0 = col == 0
        # global row index of each output lane (for the image's row 0 mask)
        mask_row0 = (rowg + band * row_band) == 0

        e_planes = []
        for pl_idx in range(4):
            sl = x_r[0, pl_idx * cin:(pl_idx + 1) * cin, :]  # (Cin, p_blk) i8
            acc = jax.lax.dot_general(
                we_r[:], sl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (Cmid, p_blk)
            y = acc.astype(jnp.float32) * es_r[:] + eb_r[:]
            y = jnp.clip(y, 0.0, 6.0)
            e_planes.append(
                jnp.clip(jnp.round(y * ei_r[:]), -127.0, 127.0)
            )

        # dw taps: current rows live at lane offset hw_out (one halo row
        # before); a row shift dr=1 reads from offset hw_out*(1-1)=0.
        def tap(pl_idx, dr, dc):
            # out lane q sits at block index halo + q; tap (dr, dc) reads
            # halo + q - dr*hw_out - dc (>= hw_out - 1 >= 0: no clamping)
            start = halo - dr * hw_out - dc  # static python int
            t = e_planes[pl_idx][:, start:start + p_band]
            if dc:
                t = jnp.where(mask_col0, 0.0, t)
            if dr:
                t = jnp.where(mask_row0, 0.0, t)
            return t

        pmap = {0: (1, 1), 1: (0, 0), 2: (1, 0)}
        accd = jnp.zeros((cmid, p_band), jnp.float32)
        for di in range(3):
            pr, dr = pmap[di]
            for dj in range(3):
                pc_, dc = pmap[dj]
                w_tap = wd_r[di * 3 + dj, :][:, None]  # (Cmid, 1)
                accd = accd + w_tap * tap(_plane_index(pr, pc_), dr, dc)
        yd = accd * ds_r[:] + db_r[:]
        yd = jnp.clip(yd, 0.0, 6.0)
        qd = jnp.clip(jnp.round(yd * di_r[:]), -127.0, 127.0)

        accp = jax.lax.dot_general(
            wp_r[:], qd.astype(jnp.int8), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        yp = accp * ps_r[:] + pb_r[:]
        out_r[0] = jnp.clip(jnp.round(yp), -127.0, 127.0).astype(jnp.int8)

    grid = (b, n_bands)
    c_spec = lambda shape: pl.BlockSpec(shape, lambda i, j: (0, 0))  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            c_spec((cmid, cin)),            # we
            c_spec((cmid, 1)),              # e_scale
            c_spec((cmid, 1)),              # e_bias
            c_spec((cmid, 1)),              # e_inv_sdw
            c_spec((9, cmid)),              # wd (tap-major, f32)
            c_spec((cmid, 1)),              # d_scale
            c_spec((cmid, 1)),              # d_bias
            c_spec((cmid, 1)),              # d_inv_sproj
            c_spec((cout_pad, cmid)),       # wp
            c_spec((cout_pad, 1)),          # p_scale
            c_spec((cout_pad, 1)),          # p_bias
            # x: halo-padded planar input (B, 4*Cin, hw_out + P):
            # band j's block = lanes [j*p_band, j*p_band + p_blk)
            pl.BlockSpec(
                (1, 4 * cin, p_blk),
                lambda i, j: (i, 0, j),
            ),
        ],
        out_specs=pl.BlockSpec((1, cout_pad, p_band), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct(
            (b, cout_pad, hw_out * hw_out), jnp.int8
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )


def pad_bands(x_planar, hw_out: int, row_band: int,
              halo_lo=None, halo_hi: int = 0):
    """Overlap-pad the planar input so band blocks of p_band lanes starting
    at j*p_band each SEE their one-halo-row-above: block j must cover flat
    lanes [j*p_band - hw_out, j*p_band + p_band). With disjoint-block
    granularity p_band this needs the input REPLICATED per band with its
    halo: out lanes [j*(p_band+hw_out), (j+1)*(p_band+hw_out)) =
    x[j*p_band - hw_out : j*p_band + p_band] (leading halo zero for j=0).

    NOTE (probe honesty): this host-side restaging is NOT how the
    productized kernel would get its halo (it would DMA overlapping slices
    from HBM via a manual pipeline); it exists to let the automatic
    pipeline express overlapping reads. It inflates the kernel's input
    traffic by hw_out/p_band (1/row_band) — counted against the kernel in
    the floor arithmetic, so the measured number is a lower bound on the
    productized form.
    """
    import jax.numpy as jnp

    b, c4, p = x_planar.shape
    n_bands = (p // hw_out) // row_band
    p_band = row_band * hw_out
    if halo_lo is None:
        halo_lo = s2_halo(hw_out)
    chunks = []
    for j in range(n_bands):
        lo = j * p_band - halo_lo
        hi = j * p_band + p_band + halo_hi
        pre = max(0, -lo)
        post = max(0, hi - p)
        body = x_planar[:, :, max(0, lo):min(p, hi)]
        parts = []
        if pre:
            parts.append(jnp.zeros((b, c4, pre), x_planar.dtype))
        parts.append(body)
        if post:
            parts.append(jnp.zeros((b, c4, post), x_planar.dtype))
        chunks.append(jnp.concatenate(parts, axis=2) if len(parts) > 1
                      else body)
    return jnp.concatenate(chunks, axis=2)


def make_fused_block_s1_kernel(
    b: int, cin: int, cmid: int, hw: int, row_band: int = 20,
    residual: bool = True, cin_pad: int = None, interpret: bool = False,
):
    """Stride-1 fused MBConv (block_2 shape): bf16 planar input -> quantize
    at the expand scale in VMEM -> expand -> 3x3/s1 dw -> project -> bf16
    out (+ residual). cout == cin (residual blocks); grid (B, n_bands).

    The 3x3/s1 dw reads the SAME plane at 9 shifts ((di-1)*hw + (dj-1));
    the band needs one halo row above AND below, supplied by pad_bands
    (halo_lo=2*hw, halo_hi=hw+1 rounded up to 2*hw for tap-start margin).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p_band = row_band * hw
    n_bands = hw // row_band
    assert hw % row_band == 0
    # minimum tile-aligned halos: taps reach hw+1 lanes past each end
    halo_lo = -(-(hw + 1) // 128) * 128
    halo_hi = halo_lo
    p_blk = p_band + halo_lo + halo_hi
    cout_pad = max(32, cin)
    if cin_pad is None:
        cin_pad = cout_pad
    # input arrives zero-padded to cin_pad (== cout_pad) channel rows: the
    # expand weight is zero on the pad columns, and the residual add is a
    # direct row-aligned add (jnp.pad inside the kernel trips a Mosaic
    # sublane-misaligned concatenate bug)
    assert cin_pad == cout_pad

    def kernel(inv_se_r, we_r, es_r, eb_r, ei_r, wd_r, ds_r, db_r, di_r,
               wp_r, ps_r, pb_r, x_r, out_r):
        band = pl.program_id(1)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, p_band), 1) % hw
        rowg = jax.lax.broadcasted_iota(jnp.int32, (1, p_band), 1) // hw
        grow = rowg + band * row_band
        masks = {
            (-1, 0): grow == 0, (1, 0): grow == hw - 1,
            (0, -1): col == 0, (0, 1): col == hw - 1,
        }

        # quantize the bf16 input at the expand scale (scalar), in VMEM
        xf = x_r[0].astype(jnp.float32)
        xq = jnp.clip(jnp.round(xf * inv_se_r[0, 0]), -127.0, 127.0)

        acc = jax.lax.dot_general(
            we_r[:], xq.astype(jnp.int8), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (Cmid, p_blk)
        y = acc.astype(jnp.float32) * es_r[:] + eb_r[:]
        y = jnp.clip(y, 0.0, 6.0)
        e = jnp.clip(jnp.round(y * ei_r[:]), -127.0, 127.0)

        accd = jnp.zeros((cmid, p_band), jnp.float32)
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                start = halo_lo + di * hw + dj  # static python int
                t = e[:, start:start + p_band]
                if di:
                    t = jnp.where(masks[(di, 0)], 0.0, t)
                if dj:
                    t = jnp.where(masks[(0, dj)], 0.0, t)
                w_tap = wd_r[(di + 1) * 3 + (dj + 1), :][:, None]
                accd = accd + w_tap * t
        yd = accd * ds_r[:] + db_r[:]
        yd = jnp.clip(yd, 0.0, 6.0)
        qd = jnp.clip(jnp.round(yd * di_r[:]), -127.0, 127.0)

        accp = jax.lax.dot_general(
            wp_r[:], qd.astype(jnp.int8), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        yp = accp * ps_r[:] + pb_r[:]
        if residual:
            yp = yp + xf[:, halo_lo:halo_lo + p_band]
        out_r[0] = yp.astype(jnp.bfloat16)

    grid = (b, n_bands)
    c_spec = lambda shape: pl.BlockSpec(shape, lambda i, j: (0, 0))  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            c_spec((1, 1)),                 # inv expand act scale (scalar)
            c_spec((cmid, cin_pad)),        # we (zero-padded cols)
            c_spec((cmid, 1)),              # e_scale
            c_spec((cmid, 1)),              # e_bias
            c_spec((cmid, 1)),              # e_inv_sdw (per-channel)
            c_spec((9, cmid)),              # wd tap-major f32
            c_spec((cmid, 1)),              # d_scale
            c_spec((cmid, 1)),              # d_bias
            c_spec((cmid, 1)),              # d_inv_sproj
            c_spec((cout_pad, cmid)),       # wp
            c_spec((cout_pad, 1)),          # p_scale
            c_spec((cout_pad, 1)),          # p_bias
            pl.BlockSpec((1, cin_pad, p_blk), lambda i, j: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec(
            (1, cout_pad, p_band), lambda i, j: (i, 0, j)
        ),
        out_shape=jax.ShapeDtypeStruct((b, cout_pad, hw * hw), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )


def fused_block_s1_ref(
    x_planar,  # (B, Cin, P) bf16
    inv_se, we, e_scale, e_bias, e_inv_sdw,
    wd, d_scale, d_bias, d_inv_sproj,
    wp, p_scale, p_bias,
    hw: int, residual: bool = True,
):
    """jnp reference of the s1 fused block (planar, 9-shift dw)."""
    import jax
    import jax.numpy as jnp

    cmid = we.shape[0]
    p = x_planar.shape[-1]
    col = jnp.arange(p, dtype=jnp.int32) % hw
    row = jnp.arange(p, dtype=jnp.int32) // hw

    def one(img):
        xf = img.astype(jnp.float32)
        xq = jnp.clip(jnp.round(xf * inv_se[0, 0]), -127.0, 127.0)
        acc = jax.lax.dot_general(
            we, xq.astype(jnp.int8), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = jnp.clip(acc.astype(jnp.float32) * e_scale + e_bias, 0.0, 6.0)
        e = jnp.clip(jnp.round(y * e_inv_sdw), -127.0, 127.0)
        accd = jnp.zeros((cmid, p), jnp.float32)
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                t = jnp.roll(e, -(di * hw + dj), axis=1)
                if di == -1:
                    t = jnp.where((row == 0)[None, :], 0.0, t)
                if di == 1:
                    t = jnp.where((row == hw - 1)[None, :], 0.0, t)
                if dj == -1:
                    t = jnp.where((col == 0)[None, :], 0.0, t)
                if dj == 1:
                    t = jnp.where((col == hw - 1)[None, :], 0.0, t)
                w_tap = wd.reshape(3, 3, cmid)[di + 1, dj + 1][:, None]
                accd = accd + w_tap * t
        yd = jnp.clip(accd * d_scale + d_bias, 0.0, 6.0)
        qd = jnp.clip(jnp.round(yd * d_inv_sproj), -127.0, 127.0)
        accp = jax.lax.dot_general(
            wp, qd.astype(jnp.int8), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        yp = accp * p_scale + p_bias
        if residual:
            cout_pad = wp.shape[0]
            cin_ = xf.shape[0]
            xr = (jnp.pad(xf, ((0, cout_pad - cin_), (0, 0)))
                  if cout_pad > cin_ else xf)
            yp = yp + xr
        return yp.astype(jnp.bfloat16)

    return jax.vmap(one)(x_planar)


def xla_nhwc_chain(cin: int, cmid: int, cout: int):
    """The serving program's form of the same block: three NHWC int8 convs
    with fused requant epilogues (engine._conv quant-mode semantics)."""
    import jax
    import jax.numpy as jnp

    def fn(x_nhwc, we_hwio, e_scale, e_bias, e_inv_sdw,
           wd_hwio, d_scale, d_bias, d_inv_sproj,
           wp_hwio, p_scale, p_bias):
        def conv(x, k, stride, groups):
            return jax.lax.conv_general_dilated(
                x, k, (stride, stride), [(1, 1), (1, 1)] if k.shape[0] == 3
                else [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
                preferred_element_type=jnp.int32,
            )
        y = conv(x_nhwc, we_hwio, 1, 1).astype(jnp.float32)
        y = jnp.clip(y * e_scale + e_bias, 0.0, 6.0)
        xq = jnp.clip(jnp.round(y * e_inv_sdw), -127.0, 127.0).astype(jnp.int8)
        y = conv(xq, wd_hwio, 2, cmid).astype(jnp.float32)
        y = jnp.clip(y * d_scale + d_bias, 0.0, 6.0)
        xq = jnp.clip(jnp.round(y * d_inv_sproj), -127.0, 127.0).astype(jnp.int8)
        y = conv(xq, wp_hwio, 1, 1).astype(jnp.float32)
        y = y * p_scale + p_bias
        return jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)

    return fn


def xla_nhwc_chain_s1(cin: int, cmid: int, cout: int,
                      residual: bool = True):
    """NHWC form of the s1 block: quantize bf16 input -> expand -> dw/s1 ->
    project -> bf16 (+ residual) — the serving program's per-block shape."""
    import jax
    import jax.numpy as jnp

    def fn(x_nhwc, inv_se, we_hwio, e_scale, e_bias, e_inv_sdw,
           wd_hwio, d_scale, d_bias, d_inv_sproj,
           wp_hwio, p_scale, p_bias):
        def conv(x, k, groups):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1),
                [(1, 1), (1, 1)] if k.shape[0] == 3 else [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
                preferred_element_type=jnp.int32,
            )
        xf = x_nhwc.astype(jnp.float32)
        xq = jnp.clip(jnp.round(xf * inv_se), -127.0, 127.0).astype(jnp.int8)
        y = conv(xq, we_hwio, 1).astype(jnp.float32)
        y = jnp.clip(y * e_scale + e_bias, 0.0, 6.0)
        q = jnp.clip(jnp.round(y * e_inv_sdw), -127.0, 127.0).astype(jnp.int8)
        y = conv(q, wd_hwio, cmid).astype(jnp.float32)
        y = jnp.clip(y * d_scale + d_bias, 0.0, 6.0)
        q = jnp.clip(jnp.round(y * d_inv_sproj), -127.0, 127.0).astype(jnp.int8)
        y = conv(q, wp_hwio, 1).astype(jnp.float32)
        y = y * p_scale + p_bias
        if residual:
            cpad = y.shape[-1]
            xr = (jnp.pad(xf, ((0, 0),) * 3 + ((0, cpad - cin),))
                  if cpad > cin else xf)
            y = y + xr
        return y.astype(jnp.bfloat16)

    return fn


def run_probe_s1(
    batch: int = 128, hw: int = 160, cin: int = 24, cmid: int = 144,
    row_band: int = 20, passes: int = 3,
) -> dict:
    """Device probe of the s1 fused block at block_2 scale vs the XLA NHWC
    chain. Same dep-chained timing as run_probe."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpucenterface.bench.timing import dep_op_time_ms, median_spread

    cout_pad = 32
    prm = make_params(cin, cmid, cout_pad, seed=7)
    rng = np.random.RandomState(2)
    x = jnp.asarray(
        (rng.rand(batch, cin, hw * hw).astype(np.float32) * 4 - 2)
    ).astype(jnp.bfloat16)
    inv_se = jnp.asarray(np.array([[37.5]], np.float32))
    args = [inv_se] + [jnp.asarray(prm[k]) for k in (
        "we", "e_scale", "e_bias", "e_inv_sdw", "wd", "d_scale", "d_bias",
        "d_inv_sproj", "wp", "p_scale", "p_bias",
    )]
    cin_pad = 32
    x32 = jnp.concatenate(
        [x, jnp.zeros((batch, cin_pad - cin, hw * hw), x.dtype)], axis=1
    )
    args_k = list(args)
    args_k[1] = jnp.concatenate(  # we: zero columns for the pad channels
        [args[1], jnp.zeros((cmid, cin_pad - cin), args[1].dtype)], axis=1
    )
    halo = -(-(hw + 1) // 128) * 128
    xp_pad = pad_bands(x32, hw, row_band, halo_lo=halo, halo_hi=halo)
    fused = make_fused_block_s1_kernel(batch, cin, cmid, hw, row_band)

    # correctness on 2 images (device)
    small = make_fused_block_s1_kernel(2, cin, cmid, hw, row_band)
    got = np.asarray(jax.jit(small)(*args_k, xp_pad[:2]).astype(jnp.float32))
    ref = np.asarray(jax.jit(
        fused_block_s1_ref, static_argnames=("hw", "residual")
    )(x[:2], *args, hw=hw).astype(jnp.float32))
    np.testing.assert_array_equal(got, ref)

    # NHWC chain args
    x_nhwc = jnp.asarray(
        np.moveaxis(np.asarray(x.astype(jnp.float32)), 1, 2).reshape(
            batch, hw, hw, cin)
    ).astype(jnp.bfloat16)
    we_hwio = jnp.asarray(prm["we"]).T.reshape(1, 1, cin, cmid)
    wd_hwio = jnp.asarray(prm["wd"].reshape(3, 3, 1, cmid).astype(np.int8))
    wp_hwio = jnp.asarray(prm["wp"]).T.reshape(1, 1, cmid, cout_pad)
    bc = lambda v: jnp.asarray(v.reshape(1, 1, 1, -1))  # noqa: E731
    nhwc_args = (
        jnp.float32(37.5), we_hwio, bc(prm["e_scale"]), bc(prm["e_bias"]),
        bc(prm["e_inv_sdw"]), wd_hwio, bc(prm["d_scale"]), bc(prm["d_bias"]),
        bc(prm["d_inv_sproj"]), wp_hwio, bc(prm["p_scale"]), bc(prm["p_bias"]),
    )
    chain = xla_nhwc_chain_s1(cin, cmid, cout_pad)

    def time_fn(op, xx):
        vals = [dep_op_time_ms(op, xx) for _ in range(passes)]
        return median_spread(vals, ndigits=6)

    t_fused, sp_fused = time_fn(lambda c: fused(*args_k, c), xp_pad)
    t_chain, sp_chain = time_fn(lambda c: chain(c, *nhwc_args), x_nhwc)

    return {
        "shape": (
            f"s1 block: ({batch},{hw},{hw},{cin}) bf16 -> expand {cmid} -> "
            f"dw3x3/s1 -> project -> +residual, bf16 out"
        ),
        "fused_ms": round(t_fused, 3),
        "fused_spread_ms": [round(v, 3) for v in sp_fused],
        "xla_chain_ms": round(t_chain, 3),
        "xla_chain_spread_ms": [round(v, 3) for v in sp_chain],
        "speedup_vs_xla": round(t_chain / t_fused, 2) if t_fused else None,
    }


def make_params(cin: int, cmid: int, cout_pad: int, seed: int = 0):
    import numpy as np

    rng = np.random.RandomState(seed)
    p = dict(
        we=rng.randint(-127, 128, (cmid, cin), np.int8),
        e_scale=(rng.rand(cmid, 1) * 2e-4 + 1e-4).astype(np.float32),
        e_bias=(rng.rand(cmid, 1) * 0.5).astype(np.float32),
        e_inv_sdw=(rng.rand(cmid, 1) * 40 + 20).astype(np.float32),
        wd=rng.randint(-127, 128, (9, cmid), np.int8).astype(np.float32),
        d_scale=(rng.rand(cmid, 1) * 2e-4 + 1e-4).astype(np.float32),
        d_bias=(rng.rand(cmid, 1) * 0.5).astype(np.float32),
        d_inv_sproj=(rng.rand(cmid, 1) * 40 + 20).astype(np.float32),
        wp=rng.randint(-127, 128, (cout_pad, cmid), np.int8),
        p_scale=(rng.rand(cout_pad, 1) * 2e-4 + 1e-4).astype(np.float32),
        p_bias=(rng.rand(cout_pad, 1) * 0.5).astype(np.float32),
    )
    return p


def run_probe(
    batch: int = 128, hw_in: int = 320, cin: int = 16, cmid: int = 96,
    cout: int = 24, row_band: int = 20, passes: int = 3,
) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpucenterface.bench.timing import dep_op_time_ms, median_spread

    hw_out = hw_in // 2
    cout_pad = max(32, cout)
    prm = make_params(cin, cmid, cout_pad)
    rng = np.random.RandomState(1)
    x_nhwc = jnp.asarray(
        rng.randint(-127, 128, (batch, hw_in, hw_in, cin), np.int8)
    )
    xp = nhwc_to_parity_planar(x_nhwc)
    xp_pad = pad_bands(xp, hw_out, row_band)
    args_planar = [jnp.asarray(v) for v in (
        prm["we"], prm["e_scale"], prm["e_bias"], prm["e_inv_sdw"],
        prm["wd"], prm["d_scale"], prm["d_bias"], prm["d_inv_sproj"],
        prm["wp"], prm["p_scale"], prm["p_bias"],
    )]

    fused = make_fused_block_kernel(
        batch, cin, cmid, cout_pad, hw_out, row_band
    )

    # NHWC chain args (HWIO kernels from the same weights; dw as (3,3,C,1))
    we_hwio = jnp.asarray(prm["we"]).T.reshape(1, 1, cin, cmid)
    wd_hwio = jnp.asarray(
        prm["wd"].reshape(3, 3, 1, cmid).astype(np.int8)
    )
    wp_hwio = jnp.asarray(prm["wp"]).T.reshape(1, 1, cmid, cout_pad)
    bcast = lambda v: jnp.asarray(v.reshape(1, 1, 1, -1))  # noqa: E731
    nhwc_args = (
        we_hwio, bcast(prm["e_scale"]), bcast(prm["e_bias"]),
        bcast(prm["e_inv_sdw"]), wd_hwio, bcast(prm["d_scale"]),
        bcast(prm["d_bias"]), bcast(prm["d_inv_sproj"]), wp_hwio,
        bcast(prm["p_scale"]), bcast(prm["p_bias"]),
    )
    chain = xla_nhwc_chain(cin, cmid, cout_pad)

    # -- correctness: fused kernel vs planar ref vs NHWC chain (2 images) --
    small = make_fused_block_kernel(2, cin, cmid, cout_pad, hw_out, row_band)
    got = np.asarray(jax.jit(small)(*args_planar, xp_pad[:2]))
    ref = np.asarray(jax.jit(fused_block_ref, static_argnames="hw_out")(
        xp[:2], *args_planar, hw_out=hw_out))
    np.testing.assert_array_equal(got, ref)
    chain_out = np.asarray(jax.jit(chain)(x_nhwc[:2], *nhwc_args))
    chain_planar = np.moveaxis(
        chain_out.reshape(2, hw_out * hw_out, cout_pad), 2, 1)
    np.testing.assert_array_equal(got, chain_planar)

    # timing: dep-chained slope (timing.py dep_op_time_ms)
    def time_fn(op, x):
        vals = [dep_op_time_ms(op, x) for _ in range(passes)]
        return median_spread(vals, ndigits=6)

    t_fused, sp_fused = time_fn(lambda c: fused(*args_planar, c), xp_pad)
    t_chain, sp_chain = time_fn(lambda c: chain(c, *nhwc_args), x_nhwc)
    t_stream, _ = time_fn(lambda c: c + jnp.int8(1), xp_pad)

    in_gb = xp_pad.size / 1e9
    out_gb = batch * cout_pad * hw_out * hw_out / 1e9
    return {
        "shape": (
            f"({batch},{hw_in},{hw_in},{cin}) -> "
            f"({batch},{hw_out},{hw_out},{cout_pad}) int8 fused "
            f"expand{cin}->{cmid} + dw3x3/s2 + project{cmid}->{cout_pad}"
        ),
        "fused_ms": round(t_fused, 3),
        "fused_spread_ms": [round(v, 3) for v in sp_fused],
        "xla_chain_ms": round(t_chain, 3),
        "xla_chain_spread_ms": [round(v, 3) for v in sp_chain],
        "stream_in_ms": round(t_stream, 3),
        "io_gb": round(in_gb + out_gb, 3),
        "speedup_vs_xla": round(t_chain / t_fused, 2) if t_fused else None,
    }


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="fused MBConv block Pallas probe")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--hw-in", type=int, default=320)
    p.add_argument("--cin", type=int, default=16)
    p.add_argument("--cmid", type=int, default=96)
    p.add_argument("--cout", type=int, default=24)
    p.add_argument("--row-band", type=int, default=20)
    p.add_argument("--s1", action="store_true",
                   help="probe the stride-1 residual variant (block_2 "
                   "shape: --hw-in is the block's OWN resolution)")
    args = p.parse_args(argv)
    if args.s1:
        out = run_probe_s1(
            batch=args.batch, hw=args.hw_in, cin=args.cin, cmid=args.cmid,
            row_band=args.row_band,
        )
    else:
        out = run_probe(
            batch=args.batch, hw_in=args.hw_in, cin=args.cin,
            cmid=args.cmid, cout=args.cout, row_band=args.row_band,
        )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
