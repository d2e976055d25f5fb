"""Shared torch restatement of the reference AMDModel_New forward/sample.

Composes the per-block restatements used by the golden tests
(test_joint_block_golden.py, test_motion_encoder_golden.py) into the full
model (reference ``model/model_AMD.py:1663-2838`` with the spatial
``AMDDiffusionTransformerModelImgSpatialTempMotion``,
``model/transformer.py:1746-2043``), reading weights from a flax param tree
so the same initialization drives both frameworks.
"""

import numpy as np
import torch
import torch.nn.functional as F

from hivae_tpu.ops import embeddings as emb_ops


def t(x):
    return torch.from_numpy(np.ascontiguousarray(np.asarray(x)))


# ---------------------------------------------------------------------------
# Independent sincos restatements (diffusers get_*_sincos_pos_embed):
# importing the tables from hivae_tpu.ops.embeddings would make every golden
# blind to a frequency-formula bug there — both sides would share it.
# ---------------------------------------------------------------------------


def _sincos_grid_torch(embed_dim, pos):
    omega = torch.arange(embed_dim // 2, dtype=torch.float64)
    omega = 1.0 / 10000 ** (omega / (embed_dim / 2.0))
    out = torch.einsum("m,d->md",
                       torch.as_tensor(pos, dtype=torch.float64).reshape(-1),
                       omega)
    return torch.cat([torch.sin(out), torch.cos(out)], dim=1)


def sincos_1d(embed_dim, length):
    return _sincos_grid_torch(embed_dim,
                              torch.arange(length)).to(torch.float32)


def sincos_2d(embed_dim, grid_size):
    h, w = grid_size
    gw, gh = torch.meshgrid(torch.arange(w, dtype=torch.float64),
                            torch.arange(h, dtype=torch.float64),
                            indexing="xy")
    # diffusers quirk: the first channel half encodes the W coordinate
    emb_h = _sincos_grid_torch(embed_dim // 2, gw)
    emb_w = _sincos_grid_torch(embed_dim // 2, gh)
    return torch.cat([emb_h, emb_w], dim=1).to(torch.float32)


def lin(p, x):
    return x @ t(p["kernel"]) + t(p["bias"])


def ln(p, x, eps=1e-5):
    return F.layer_norm(x, (x.shape[-1],), t(p["scale"]), t(p["bias"]),
                        eps=eps)


def attention(p, q_in, kv_in, heads, head_dim, qk_norm=True, eps=1e-6):
    b, sq, _ = q_in.shape
    sk = kv_in.shape[1]
    q = lin(p["to_q"], q_in).view(b, sq, heads, head_dim).transpose(1, 2)
    k = lin(p["to_k"], kv_in).view(b, sk, heads, head_dim).transpose(1, 2)
    v = lin(p["to_v"], kv_in).view(b, sk, heads, head_dim).transpose(1, 2)
    if qk_norm:
        q = F.layer_norm(q, (head_dim,), t(p["norm_q"]["scale"]),
                         t(p["norm_q"]["bias"]), eps=eps)
        k = F.layer_norm(k, (head_dim,), t(p["norm_k"]["scale"]),
                         t(p["norm_k"]["bias"]), eps=eps)
    o = F.scaled_dot_product_attention(q, k, v)
    return lin(p["to_out"], o.transpose(1, 2).reshape(b, sq,
                                                      heads * head_dim))


def ff(p, x):
    h = F.gelu(lin(p["net_0"], x), approximate="tanh")
    return lin(p["net_2"], h)


def adaln_zero(p, hidden, encoder, temb, dim):
    mods = lin(p["linear"], F.silu(temb))
    shift, scale, gate, e_shift, e_scale, e_gate = mods.chunk(6, dim=1)
    w, b = t(p["norm"]["scale"]), t(p["norm"]["bias"])
    hidden = F.layer_norm(hidden, (dim,), w, b, eps=1e-5) * \
        (1 + scale[:, None]) + shift[:, None]
    encoder = F.layer_norm(encoder, (dim,), w, b, eps=1e-5) * \
        (1 + e_scale[:, None]) + e_shift[:, None]
    return hidden, encoder, gate[:, None], e_gate[:, None]


def adaln_single(p, x, temb, dim):
    mods = lin(p["linear"], F.silu(temb))
    shift, scale, gate = mods.chunk(3, dim=1)
    x = F.layer_norm(x, (dim,), t(p["norm"]["scale"]), t(p["norm"]["bias"]),
                     eps=1e-5) * (1 + scale[:, None]) + shift[:, None]
    return x, gate[:, None]


def adalayer_norm(p, x, temb, dim):
    mods = lin(p["linear"], F.silu(temb))
    shift, scale = mods.chunk(2, dim=1)
    x = F.layer_norm(x, (dim,), t(p["norm"]["scale"]), t(p["norm"]["bias"]),
                     eps=1e-5)
    return x * (1 + scale[:, None]) + shift[:, None]


def patchify(p, x, patch):
    """(N,C,H,W) -> (N, hw, hidden), channel-major patches (PatchEmbed)."""
    n, c, h, w = x.shape
    hp, wp = h // patch, w // patch
    xp = x.reshape(n, c, hp, patch, wp, patch)
    xp = xp.permute(0, 2, 4, 1, 3, 5).reshape(n, hp * wp, c * patch * patch)
    return lin(p["proj"], xp)


def unpatchify(tok, height, width, patch, channels):
    n = tok.shape[0]
    hp, wp = height // patch, width // patch
    x = tok.reshape(n, hp, wp, channels, patch, patch)
    return x.permute(0, 3, 1, 4, 2, 5).reshape(n, channels, height, width)


def time_embed(p, timestep, sinusoid_dim):
    emb = t(emb_ops.timestep_embedding(timestep, sinusoid_dim))
    emb = F.silu(lin(p["linear_1"], emb))
    return lin(p["linear_2"], emb)


def basic_block(p, x, heads, head_dim, key_mask=None):
    if key_mask is not None:
        raise NotImplementedError(
            "torch_ref.basic_block does not restate masked attention; "
            "extend attention() with an attn_mask before golden-testing "
            "the masked encoder path")
    h = ln(p["norm1"], x)
    x = x + attention(p["attn1"], h, h, heads, head_dim)
    h = ln(p["norm2"], x)
    return x + ff(p["ff"], h)


def cross_block(p, x, kv, heads, head_dim):
    h = ln(p["norm1"], x)
    x = x + attention(p["attn1"], h, kv, heads, head_dim)
    h = ln(p["norm2"], x)
    return x + ff(p["ff"], h)


def joint_block(p, hidden, encoder, temb, heads, head_dim, dim):
    el = encoder.shape[1]
    h, e, gate, e_gate = adaln_zero(p["norm1"], hidden, encoder, temb, dim)
    out = attention(p["attn1"], torch.cat([e, h], 1),
                    torch.cat([e, h], 1), heads, head_dim)
    hidden = hidden + gate * out[:, el:]
    encoder = encoder + e_gate * out[:, :el]
    h, e, gate, e_gate = adaln_zero(p["norm2"], hidden, encoder, temb, dim)
    out = ff(p["ff"], torch.cat([e, h], 1))
    hidden = hidden + gate * out[:, el:]
    encoder = encoder + e_gate * out[:, :el]
    return hidden, encoder


def dit_block(p, x, temb, heads, head_dim, dim):
    h, gate = adaln_single(p["norm1"], x, temb, dim)
    x = x + gate * attention(p["attn1"], h, h, heads, head_dim)
    h, gate = adaln_single(p["norm2"], x, temb, dim)
    return x + gate * ff(p["ff"], h)


# ---------------------------------------------------------------------------
# signal path
# ---------------------------------------------------------------------------


def band_split(x_nthw, d_low, d_high):
    """Mirror of amd._band_split: NCTHW fft, gaussian masks at the two
    cutoffs (reference frequency_utils.py:45-108)."""
    from hivae_tpu.ops import frequency

    x = t(x_nthw).permute(0, 2, 1, 3, 4)  # n c t h w
    shape = x.shape[2:]
    xf = torch.fft.fftshift(torch.fft.fftn(x, dim=(-3, -2, -1)),
                            dim=(-3, -2, -1))

    def band(d, low_side):
        lpf = t(np.asarray(
            frequency.gaussian_low_pass_filter(tuple(shape), d, d)))
        mask = lpf if low_side else (1 - lpf)
        return torch.fft.ifftn(
            torch.fft.ifftshift(xf * mask, dim=(-3, -2, -1)),
            dim=(-3, -2, -1)).real

    low = band(d_low, True)
    high = band(d_high, False)
    return low.permute(0, 2, 1, 3, 4), high.permute(0, 2, 1, 3, 4)


# ---------------------------------------------------------------------------
# encoders
# ---------------------------------------------------------------------------


def motion_encoder_spatial(p, video, cfg):
    """(N,T,C,H,W) -> (N,T,L,mch); reference transformer.py:36-192."""
    n, tt, c, h, w = video.shape
    heads, head_dim = cfg.enc_nhead, cfg.enc_ndim
    hidden = heads * head_dim
    patch = cfg.image_patch_size
    ltok = cfg.object_motion_token_num
    mch = cfg.object_motion_token_channel
    iph, ipw = cfg.image_height // patch, cfg.image_width // patch

    mtok = lin(p["motion_embed"], t(p["motion_token"]))
    mtok = mtok.expand(n * tt, -1, -1)
    x = patchify(p["patch_embed"], t(video).reshape(n * tt, c, h, w), patch)
    pos = sincos_2d(hidden, (iph, ipw))
    x = x + pos[None]
    hstate = torch.cat([mtok, x], dim=1)
    for i in range(cfg.object_enc_num_layers):
        hstate = basic_block(p[f"blocks_{i}"], hstate, heads, head_dim)
    out = ln(p["norm_final"], hstate[:, :ltok])
    out = lin(p["proj_out"], out)
    if cfg.motion_need_norm_out:
        out = F.layer_norm(out, (mch,), eps=1e-5)
    return out.reshape(n, tt, ltok, mch)


def motion_encoder_temporal_cross(p, video, cfg):
    """(N,T,C,H,W) -> (N,T,S,mch); reference transformer.py:406-586."""
    n, tt, c, h, w = video.shape
    heads, head_dim = cfg.enc_nhead, cfg.enc_ndim
    hidden = heads * head_dim
    patch = cfg.image_patch_size
    mch = cfg.camera_motion_token_channel
    cam_h = cfg.image_height // 4 if cfg.use_camera_down else cfg.image_height
    cam_w = cfg.image_width // 4 if cfg.use_camera_down else cfg.image_width
    iph, ipw = cam_h // patch, cam_w // patch
    s = iph * ipw

    x = patchify(p["patch_embed"], t(video).reshape(n * tt, c, h, w), patch)
    spos = sincos_2d(hidden, (iph, ipw))
    x = x + spos[None]
    tpos = sincos_1d(hidden, cfg.video_frames)
    x = x.reshape(n, tt, s, hidden) + tpos[None, :tt, None, :]

    mtok = lin(p["motion_embed"], t(p["motion_token"]))  # (1, L, hidden)
    mtok = mtok[:, None].expand(n, s, -1, -1)
    if cfg.camera_motion_token_num != tt:
        mtok = torch.repeat_interleave(
            mtok, tt // cfg.camera_motion_token_num, dim=2)
    mtok = mtok.reshape(n * s, tt, hidden) + tpos[None, :tt]

    kv = x.permute(0, 2, 1, 3).reshape(n * s, tt, hidden)
    for i in range(cfg.camera_enc_num_layers):
        mtok = cross_block(p[f"blocks_{i}"], mtok, kv, heads, head_dim)
    mtok = ln(p["norm_final"], mtok)
    mtok = lin(p["proj_out"], mtok)
    if cfg.motion_need_norm_out:
        mtok = F.layer_norm(mtok, (mch,), eps=1e-5)
    return mtok.reshape(n, s, tt, mch).permute(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# spatial DiT + full model
# ---------------------------------------------------------------------------


def dit_img_spatial_temp(p, image_hidden, timestep, camera_target,
                         object_source, object_target, cfg):
    """VelocityDiTImgSpatialTempMotion restatement (reference
    transformer.py:1746-2043)."""
    heads = cfg.diffusion_attn_num_heads
    head_dim = cfg.diffusion_attn_head_dim
    hidden = heads * head_dim
    patch = cfg.image_patch_size
    n_t, ci, hi, wi = image_hidden.shape
    tt = cfg.video_frames
    n = n_t // tt
    s = hi * wi // patch ** 2

    emb = time_embed(p["time_embedding"], timestep, hidden)
    emb_s = emb.reshape(n, tt, -1)[:, 0:1, :].expand(n, s, -1).reshape(
        n * s, -1)

    img = patchify(p["image_patch_embed"], image_hidden, patch)
    img = img + sincos_2d(hidden, (hi // patch, wi // patch))[None]
    tpos = sincos_1d(hidden, tt)
    img = img.reshape(n, tt, s, hidden).permute(0, 2, 1, 3) + tpos[None, None]
    img = img.permute(0, 2, 1, 3).reshape(n_t, s, hidden)

    cam = None
    if camera_target is not None:
        nc, tc, sc, dc = camera_target.shape
        cam = lin(p["camera_motion_patch_embed"],
                  camera_target.reshape(nc * tc, sc, dc))

    motion = None
    if object_source is not None:
        l = object_target.shape[1]
        msl = 2 * l + 2
        src_tok = t(p["source_token"]).expand(n_t, -1, -1)
        tgt_tok = t(p["target_token"]).expand(n_t, -1, -1)
        motion = torch.cat([src_tok, lin(p["object_motion_patch_embed"],
                                         object_source),
                            tgt_tok, lin(p["object_motion_patch_embed"],
                                         object_target)], dim=1)
        motion = motion + sincos_1d(hidden, msl)[None]

    for i in range(cfg.diffusion_num_layers):
        if motion is not None:
            motion, img = joint_block(p[f"object_blocks_{i}"], motion, img,
                                      emb, heads, head_dim, hidden)
        if cam is not None:
            cam, img = joint_block(p[f"camera_blocks_{i}"], cam, img, emb,
                                   heads, head_dim, hidden)
        img = img.reshape(n, tt, s, hidden).permute(0, 2, 1, 3).reshape(
            n * s, tt, hidden)
        img = dit_block(p[f"spatial_blocks_{i}"], img, emb_s, heads,
                        head_dim, hidden)
        img = img.reshape(n, s, tt, hidden).permute(0, 2, 1, 3).reshape(
            n_t, s, hidden)

    x = ln(p["norm_final"], img)
    x = adalayer_norm(p["norm_out"], x, emb, hidden)
    x = lin(p["proj_out"], x)
    return unpatchify(x, hi, wi, patch, cfg.diffusion_out_channels)


def amd_new_encode(p, video, ref_img, video_grey, ref_grey, cfg,
                   low_cut, high_cut, camera_mask=None):
    """Reference AMDModel_New.encode / forward's motion-encoding stage.

    ``camera_mask``: LF band multiply before the camera encoder
    (reference AMDModel_Camera.forward:1137)."""
    if not cfg.use_filter or getattr(cfg, "use_camera_down", False):
        raise NotImplementedError(
            "torch_ref.amd_new_encode mirrors the use_filter=True, "
            "use_camera_down=False configuration only — extend the "
            "restatement before golden-testing other configs")
    n, tt = video.shape[:2]
    refimg_and_video = torch.cat([t(ref_img), t(video)], dim=1)

    grey = torch.cat([t(ref_grey), t(video_grey)], dim=1) if cfg.use_grey \
        else refimg_and_video
    lf, _ = band_split(grey.numpy(), low_cut, high_cut)
    if camera_mask is not None:
        lf = lf * t(camera_mask)
    lf_video = lf[:, tt:]

    camera_target = motion_encoder_temporal_cross(
        p["camera_motion_encoder"], lf_video, cfg)
    object_motion = motion_encoder_spatial(
        p["object_motion_encoder"], refimg_and_video, cfg)
    l, d = object_motion.shape[2:]
    object_source = object_motion[:, :tt].reshape(n * tt, l, d)
    object_target = object_motion[:, tt:].reshape(n * tt, l, d)
    return camera_target, object_source, object_target


def amd_new_velocity(params, zi, zt, time_step, cam_t, obj_s, obj_t, cfg):
    p = params["params"]
    image_hidden = torch.cat([zi, zt], dim=1)
    return dit_img_spatial_temp(p["diffusion_transformer"], image_hidden,
                                time_step, cam_t, obj_s, obj_t, cfg)


def amd_new_sample(params, video, ref_img, video_grey, ref_grey, z0,
                   sample_step, cfg):
    """Euler reconstruction (reference AMDModel_New.sample:2020-2195):
    encode at cutoffs (0.6, 0.6), walk step_seq from num_steps."""
    p = params["params"]
    n, tt = video.shape[:2]
    cam_t, obj_s, obj_t = amd_new_encode(p, video, ref_img, video_grey,
                                         ref_grey, cfg, 0.6, 0.6)
    zi = t(ref_img).reshape((n * tt,) + tuple(ref_img.shape[2:]))
    num_steps = cfg.scheduler_num_step
    step_seq = np.linspace(0, num_steps, num=sample_step + 1, endpoint=True,
                           dtype=int)[1:][::-1]
    dt = 1.0 / sample_step
    zt = t(z0)
    for step in step_seq:
        ts = np.full((zt.shape[0],), float(step), dtype=np.float32)
        pre = amd_new_velocity(params, zi, zt, ts, cam_t, obj_s, obj_t, cfg)
        zt = zt + pre * dt
    return zt.reshape((n, tt) + tuple(zt.shape[1:]))
