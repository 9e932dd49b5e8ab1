"""Figure helper tests (Agg backend, no display)."""
import numpy as np

from autovc_tpu.utils import visual


def test_plot_conversion(rng):
    fig = visual.plot_conversion(rng.random((80, 100)),
                                 rng.random((80, 100)))
    assert fig is not None
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_visualise_embedding(rng):
    emb = rng.standard_normal((3, 5, 16)).astype(np.float32)
    fig = visual.visualise_embedding(emb)
    assert fig is not None
    import matplotlib.pyplot as plt
    plt.close(fig)
