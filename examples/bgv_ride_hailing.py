"""Oblivious ride hailing: encrypted nearest-driver search.

Analog of the reference's examples/singleparty/bgv_ride_hailing (the
ORide protocol, USENIX Security'17): a rider encrypts her grid
coordinates under an ephemeral key; each driver encodes her coordinates
in a designated slot and encrypts under the rider's public key; the
server homomorphically computes the squared distance to every driver in
SIMD, and only the rider can decrypt and pick the closest one.
"""

import numpy as np
import jax

from lattigo_tpu import rlwe
from lattigo_tpu.schemes import bgv


def main(n_drivers: int = 32):
    # plaintext modulus large enough for squared grid distances
    params = bgv.Parameters(bgv.ParametersLiteral(
        log_n=11, log_q=(48, 40, 40), log_p=(50,), t=65537))
    kgen = rlwe.KeyGenerator(params)
    k_sk, k_rlk, *k_cts = jax.random.split(jax.random.PRNGKey(0),
                                           3 + n_drivers)
    sk = kgen.gen_secret_key(k_sk)          # rider's ephemeral secret
    pk = kgen.gen_public_key(jax.random.PRNGKey(1), sk)
    rlk = kgen.gen_relinearization_key(k_rlk, sk)
    ev = bgv.Evaluator(params, rlwe.EvaluationKeySet(relinearization_key=rlk))
    enc = bgv.Encoder(params)
    encryptor = rlwe.Encryptor(params, pk)

    grid = 256
    rng = np.random.default_rng(7)
    rider = rng.integers(0, grid, 2)
    drivers = rng.integers(0, grid, (n_drivers, 2))

    # rider: (x, y) replicated into every (even, odd) slot pair
    rider_x = np.full(params.n, rider[0], dtype=np.int64)
    rider_y = np.full(params.n, rider[1], dtype=np.int64)
    ct_rx = encryptor.encrypt(k_cts[0], enc.encode(rider_x))
    ct_ry = encryptor.encrypt(k_cts[1], enc.encode(rider_y))

    # each driver: coordinates in her own slot, encrypted under rider pk;
    # the server sums them into one SIMD ciphertext per axis
    ct_dx = ct_dy = None
    for i in range(n_drivers):
        dx = np.zeros(params.n, dtype=np.int64)
        dy = np.zeros(params.n, dtype=np.int64)
        dx[i], dy[i] = drivers[i]
        ka, kb = jax.random.split(k_cts[2 + i % (n_drivers - 2)])
        ca = encryptor.encrypt(ka, enc.encode(dx))
        cb = encryptor.encrypt(kb, enc.encode(dy))
        ct_dx = ca if ct_dx is None else ev.add(ct_dx, ca)
        ct_dy = cb if ct_dy is None else ev.add(ct_dy, cb)

    # server: (xr - xd)^2 + (yr - yd)^2 per slot, one relinearized level
    dx = ev.sub(ct_rx, ct_dx)
    dy = ev.sub(ct_ry, ct_dy)
    dist = ev.add(ev.mul_relin(dx, dx), ev.mul_relin(dy, dy))
    dist = ev.rescale(dist)

    # rider decrypts and selects
    got = enc.decode(rlwe.Decryptor(params, sk).decrypt(dist)) % params.t
    d2 = got[:n_drivers].astype(np.int64)
    want = ((drivers - rider) ** 2).sum(axis=1)
    assert np.array_equal(d2, want % params.t), "distance mismatch"
    best = int(np.argmin(d2))
    print(f"rider at {tuple(rider)}: closest of {n_drivers} drivers is "
          f"#{best} at {tuple(drivers[best])}, d^2={d2[best]}")


if __name__ == "__main__":
    main()
