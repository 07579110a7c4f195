"""Host-side support libraries (primes, big-number approximation, PRNG).

TPU-native analog of the reference's ``utils/`` layer
(``/root/reference/utils``): arbitrary-precision approximation tooling,
deterministic PRNGs, and number-theory helpers. Everything here runs on the
host at parameter-generation time; nothing in this package touches a device.
"""
