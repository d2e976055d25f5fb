"""PyTorch baseline for the headline VAE benchmark (CPU, or CUDA if present).

A torch restatement of the same AutoencoderKL architecture (sd-vae-ft-mse
config) running encode+decode of 16 frames @ 256² — the reference's cost
basis for the ">=10x PyTorch-CPU" target (BASELINE.md). Weights are random
(identical FLOPs/memory to real weights).

On a CUDA host this same script IS the A100 anchor measurement: run
``python benchmarks/bench_torch_cpu.py`` on an A100 and it reports fp16
eager frames/s directly — replacing bench.py's derived ``A100_FPS=60``
(roofline on the NVIDIA A100 datasheet's 312 TFLOP/s fp16 dense peak) with
a measured number. No GPU exists in this image, so the derived figure plus
this reproducible recipe is the anchor's provenance.
"""

import time

import torch
import torch.nn as nn
import torch.nn.functional as F

FRAMES = 4   # extrapolated to 16 (CPU is slow; cost is linear in frames)
RES = 256
BLOCKS = [128, 256, 512, 512]


class Resnet(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(32, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.short = nn.Conv2d(cin, cout, 1) if cin != cout else nn.Identity()

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        return self.short(x) + h


class Attn(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = nn.GroupNorm(32, c, eps=1e-6)
        self.q, self.k, self.v, self.o = (nn.Linear(c, c) for _ in range(4))

    def forward(self, x):
        n, c, h, w = x.shape
        y = self.norm(x).flatten(2).transpose(1, 2)
        out = F.scaled_dot_product_attention(
            self.q(y)[:, None], self.k(y)[:, None], self.v(y)[:, None])[:, 0]
        return x + self.o(out).transpose(1, 2).reshape(n, c, h, w)


class Mid(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.r1, self.attn, self.r2 = Resnet(c, c), Attn(c), Resnet(c, c)

    def forward(self, x):
        return self.r2(self.attn(self.r1(x)))


class Encoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv_in = nn.Conv2d(3, BLOCKS[0], 3, padding=1)
        downs = []
        prev = BLOCKS[0]
        for i, c in enumerate(BLOCKS):
            downs += [Resnet(prev, c), Resnet(c, c)]
            prev = c
            if i < 3:
                downs.append(nn.Conv2d(c, c, 3, stride=2))
        self.downs = nn.ModuleList(downs)
        self.mid = Mid(BLOCKS[-1])
        self.norm_out = nn.GroupNorm(32, BLOCKS[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(BLOCKS[-1], 8, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for m in self.downs:
            if isinstance(m, nn.Conv2d):
                x = m(F.pad(x, (0, 1, 0, 1)))
            else:
                x = m(x)
        x = self.mid(x)
        return self.conv_out(F.silu(self.norm_out(x)))


class Decoder(nn.Module):
    def __init__(self):
        super().__init__()
        rev = BLOCKS[::-1]
        self.conv_in = nn.Conv2d(4, rev[0], 3, padding=1)
        self.mid = Mid(rev[0])
        ups = []
        prev = rev[0]
        for i, c in enumerate(rev):
            ups += [Resnet(prev, c), Resnet(c, c), Resnet(c, c)]
            prev = c
            if i < 3:
                ups.append(nn.Conv2d(c, c, 3, padding=1))  # after 2x upsample
        self.ups = nn.ModuleList(ups)
        self.norm_out = nn.GroupNorm(32, rev[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(rev[-1], 3, 3, padding=1)

    def forward(self, x):
        x = self.mid(self.conv_in(x))
        for m in self.ups:
            if isinstance(m, nn.Conv2d):
                x = m(F.interpolate(x, scale_factor=2, mode="nearest"))
            else:
                x = m(x)
        return self.conv_out(F.silu(self.norm_out(x)))


def main():
    torch.set_grad_enabled(False)
    cuda = torch.cuda.is_available()
    device = "cuda" if cuda else "cpu"
    dtype = torch.float16 if cuda else torch.float32
    frames = 16 if cuda else FRAMES
    enc = Encoder().eval().to(device=device, dtype=dtype)
    dec = Decoder().eval().to(device=device, dtype=dtype)
    x = torch.randn(frames, 3, RES, RES, device=device, dtype=dtype)
    # warmup
    z = enc(x)[:, :4]
    _ = dec(z)
    if cuda:
        torch.cuda.synchronize()
    t0 = time.perf_counter()
    iters = 10 if cuda else 2
    for _ in range(iters):
        z = enc(x)[:, :4]
        out = dec(z)
    if cuda:
        torch.cuda.synchronize()
    dt = (time.perf_counter() - t0) / iters
    fps = frames / dt
    dev = torch.cuda.get_device_name() if cuda else "CPU"
    print(f"torch-{dev} ({dtype}) VAE encode+decode: {dt*1e3:.0f} ms for "
          f"{frames}f @ {RES}^2 -> {fps:.2f} frames/s")
    print(f"(TPU v5e bf16 measured 180 f/s -> {180/fps:.0f}x this host)")


if __name__ == "__main__":
    main()
