"""Dithering oracle tests: independent scalar implementations of the
Thomas Knoll and Yliluoma2 mixing plans (straight loops, following
tilingencoder.pas:2565-2620 and the ASM path :2368-2483) checked against
the batched lax.scan implementations."""
import numpy as np
import jax.numpy as jnp

from tiler_tpu.pipeline import dither as D

RED, GREEN, BLUE, DIV = 299, 587, 114, 1000


def _cc(t, c):
    l1 = t[0] * RED + t[1] * GREEN + t[2] * BLUE
    l2 = c[0] * RED + c[1] * GREEN + c[2] * BLUE
    ld = int(abs(l1 - l2) // DIV) * (1 if l1 >= l2 else -1)
    d = [t[i] - c[i] for i in range(3)]
    return sum(x * x for x in d) * 13 + ld * ld * 32


def _tk_scalar(rgb, pal, valid):
    s = list(rgb)
    e = [0, 0, 0]
    lst = []
    for _ in range(64):
        t = [s[i] + (abs(e[i]) * 9 // 100) * (1 if e[i] >= 0 else -1) for i in range(3)]
        best, bi = None, 0
        for i, c in enumerate(pal):
            if not valid[i]:
                continue
            p = _cc(t, c)
            if best is None or p < best:
                best, bi = p, i
        lst.append(bi)
        for i in range(3):
            e[i] += s[i] - pal[bi][i]
    lum = [pal[i][0] * RED + pal[i][1] * GREEN + pal[i][2] * BLUE for i in range(len(pal))]
    lst.sort(key=lambda i: lum[i])  # stable
    return lst


def test_thomas_knoll_matches_scalar():
    rng = np.random.RandomState(5)
    S = 16
    pal = rng.randint(0, 256, (S, 3)).astype(np.int64)
    valid = np.ones(S, bool)
    valid[-2:] = False
    pixels = rng.randint(0, 256, (40, 3)).astype(np.int64)
    lists = np.asarray(
        D.thomas_knoll_lists(
            jnp.asarray(pixels, jnp.int32),
            jnp.asarray(np.broadcast_to(pal, (40, S, 3)), jnp.int32),
            jnp.asarray(np.broadcast_to(valid, (40, S))),
            S,
        )
    )
    for b in range(40):
        want = _tk_scalar(pixels[b].tolist(), pal.tolist(), valid.tolist())
        got = lists[b].tolist()
        # same luma multiset at every rank (ties may reorder equal-luma slots)
        lum = lambda i: pal[i][0] * RED + pal[i][1] * GREEN + pal[i][2] * BLUE
        assert [lum(i) for i in got] == [lum(i) for i in want], b


def _yli_scalar(rgb, pal, valid, mixed):
    r, g, b = rgb
    tgt = [r, g, b, (r * RED + g * GREEN + b * BLUE) // DIV]
    pal4 = [[c[0], c[1], c[2], (c[0] * RED + c[1] * GREEN + c[2] * BLUE) // DIV] for c in pal]
    w4 = [13, 13, 13, 32]
    so_far = [0, 0, 0, 0]
    plan = []
    while len(plan) < mixed:
        max_test = max(1, len(plan))
        best = None
        for idx in range(len(pal)):
            if not valid[idx]:
                continue
            s = list(so_far)
            add = list(pal4[idx])
            for t in range(len(plan) + 1, len(plan) + max_test + 1):
                for i in range(4):
                    s[i] += add[i]
                    add[i] += 1
                inv = (1 << 16) // t
                pen = sum(w4[i] * (((s[i] * inv) >> 16) - tgt[i]) ** 2 for i in range(4))
                if best is None or pen < best[0]:
                    best = (pen, idx, t - len(plan))
        _, chosen, amount = best
        plan.extend([chosen] * amount)
        for i in range(4):
            so_far[i] += pal4[chosen][i] * amount
    lum = [pal[i][0] * RED + pal[i][1] * GREEN + pal[i][2] * BLUE for i in range(len(pal))]
    plan.sort(key=lambda i: lum[i])
    return plan


def test_yliluoma2_matches_scalar():
    rng = np.random.RandomState(9)
    S, M = 16, 4
    pal = rng.randint(0, 256, (S, 3)).astype(np.int64)
    valid = np.ones(S, bool)
    pixels = rng.randint(0, 256, (24, 3)).astype(np.int64)
    lists, counts = D.yliluoma2_lists(
        jnp.asarray(pixels, jnp.int32),
        jnp.asarray(np.broadcast_to(pal, (24, S, 3)), jnp.int32),
        jnp.asarray(np.broadcast_to(valid, (24, S))),
        S, M,
    )
    lists = np.asarray(lists)
    counts = np.asarray(counts)
    lum = lambda i: pal[i][0] * RED + pal[i][1] * GREEN + pal[i][2] * BLUE
    for b in range(24):
        want = _yli_scalar(pixels[b].tolist(), pal.tolist(), valid.tolist(), M)
        n = counts[b]
        assert n == len(want), (b, n, len(want))
        got = lists[b][:n].tolist()
        assert [lum(i) for i in got] == [lum(i) for i in want], b


def test_color_compare_reference_values():
    # hand-computed: ColorCompare(10,20,30, 10,20,30) = 0
    assert int(D.color_compare(*map(jnp.int32, (10, 20, 30, 10, 20, 30)))) == 0
    # pure red vs black: dr=255 -> 255^2*13 + (255*299//1000)^2*32
    want = 255 * 255 * 13 + (255 * 299 // 1000) ** 2 * 32
    assert int(D.color_compare(*map(jnp.int32, (255, 0, 0, 0, 0, 0)))) == want


def test_bayer_map_values():
    assert D.BAYER8[0, 0] == 0 and D.BAYER8[0, 1] == 48
    assert sorted(D.BAYER8.reshape(-1).tolist()) == list(range(64))
