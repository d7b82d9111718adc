"""Train the tiny in-repo monodepth net (xmtpu.pipeline.depth_net).

Produces ``xmtpu/assets/tiny_monodepth.pt`` — the committed ~100 KB
checkpoint behind :class:`xmtpu.pipeline.depth_net.TinyMonoDepthModel`.
CPU-only, a few minutes; fully deterministic given the seeds below.

Data: random views of the procedural plane family
(xmtpu.pipeline.synthetic_images.render_plane_views) at randomized plane
depth z0 in [3.0, 5.5], random textures and poses; the net regresses
per-pixel log-depth with a heteroscedastic Gaussian NLL on valid pixels.
The held-out evaluation at the end prints mean relative depth error on
unseen scenes (different texture/pose seeds).

Usage: python benchmarks/train_depth_net.py [--steps 600] [--out PATH]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def make_dataset(n_scenes, views_per_scene, seed0, size=400):
    from xmtpu.pipeline.synthetic_images import render_plane_views

    rng = np.random.default_rng(seed0)
    imgs, deps = [], []
    for s in range(n_scenes):
        z0 = float(rng.uniform(3.0, 5.5))
        images, depths, _, _, _ = render_plane_views(
            n_views=views_per_scene, seed=seed0 + 1000 + s, size=size,
            z0=z0, tex_seed=seed0 + 2000 + s, rot_sigma=0.04)
        imgs += images
        deps += depths
    return imgs, deps


def main():
    import torch

    from xmtpu.pipeline.depth_net import WEIGHTS_PATH, build_net, _to_input

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--out", default=WEIGHTS_PATH)
    args = ap.parse_args()

    torch.manual_seed(0)
    np.random.seed(0)

    print("rendering training scenes ...", flush=True)
    imgs, deps = make_dataset(n_scenes=24, views_per_scene=6, seed0=10)
    X = np.concatenate([_to_input(im) for im in imgs])        # (N, 3, H, W)
    D = np.stack([d.astype(np.float32) for d in deps])        # (N, H, W)

    net = build_net()
    n_par = sum(p.numel() for p in net.parameters())
    print(f"{len(imgs)} images, net has {n_par} params", flush=True)
    opt = torch.optim.Adam(net.parameters(), lr=2e-3)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, args.steps)

    Xt = torch.from_numpy(X)
    Dt = torch.from_numpy(D)
    rng = np.random.default_rng(0)
    crop, batch = 160, 8
    t0 = time.time()
    for step in range(args.steps):
        idx = rng.integers(0, len(imgs), size=batch)
        ys = rng.integers(0, X.shape[2] - crop, size=batch)
        xs = rng.integers(0, X.shape[3] - crop, size=batch)
        xb = torch.stack([Xt[i, :, y:y + crop, x:x + crop]
                          for i, y, x in zip(idx, ys, xs)])
        db = torch.stack([Dt[i, y:y + crop, x:x + crop]
                          for i, y, x in zip(idx, ys, xs)])
        valid = db > 0
        out = net(xb)
        logz, logvar = out[:, 0], out[:, 1].clamp(-8, 4)
        tgt = torch.log(db.clamp(min=1e-3))
        nll = 0.5 * ((logz - tgt) ** 2 * torch.exp(-logvar) + logvar)
        loss = nll[valid].mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()
        if step % 100 == 0 or step == args.steps - 1:
            with torch.no_grad():
                rel = (torch.abs(torch.exp(logz) - db) / db)[valid].mean()
            print(f"step {step:4d} loss={float(loss):+.4f} "
                  f"rel={float(rel):.4f} ({time.time() - t0:.0f}s)",
                  flush=True)

    torch.save(net.state_dict(), args.out)
    print(f"saved {args.out}")

    # held-out evaluation: unseen textures/poses/depths
    print("held-out eval ...", flush=True)
    imgs_ev, deps_ev = make_dataset(n_scenes=6, views_per_scene=3,
                                    seed0=777)
    net.eval()
    rels = []
    for im, d in zip(imgs_ev, deps_ev):
        with torch.no_grad():
            out = net(torch.from_numpy(_to_input(im)))[0].numpy()
        pred = np.exp(out[0])
        m = d > 0
        rels.append(float(np.mean(np.abs(pred[m] - d[m]) / d[m])))
    print(f"held-out mean relative depth error: {np.mean(rels):.4f} "
          f"(per-image {['%.3f' % r for r in rels]})")


if __name__ == "__main__":
    main()
