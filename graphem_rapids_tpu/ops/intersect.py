"""2D segment-intersection orientation test.

Semantics match the reference implementation exactly: the test always uses the
first two coordinates even for d >= 3 embeddings (reference
graphem_rapids/backends/embedder_pytorch.py:738-774).
"""




def _orientation(a, b, c):
    """Signed area orientation of ordered triplet (a, b, c) in the xy-plane."""
    return (b[..., 0] - a[..., 0]) * (c[..., 1] - a[..., 1]) - (
        b[..., 1] - a[..., 1]
    ) * (c[..., 0] - a[..., 0])


def segments_intersect_2d(p1, p2, q1, q2):
    """Boolean mask: does segment (p1,p2) properly intersect segment (q1,q2)?

    Uses the strict orientation test on the first two coordinates only
    (reference embedder_pytorch.py:760-774). All inputs are (..., d) with
    d >= 2; output is (...,) bool.
    """
    o1 = _orientation(p1, p2, q1)
    o2 = _orientation(p1, p2, q2)
    o3 = _orientation(q1, q2, p1)
    o4 = _orientation(q1, q2, p2)
    return (o1 * o2 < 0) & (o3 * o4 < 0)
