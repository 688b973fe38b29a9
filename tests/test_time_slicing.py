"""Exact-value time-slicing tests (port of ref tests/test_time_slicing.py)."""

import numpy as np
import pytest

from neural_lam_tpu.dataset import WeatherDataset
from neural_lam_tpu.datastore.base import BaseDatastore, FieldArray


class SinglePointDummyDatastore(BaseDatastore):
    """1 grid point, integer-valued series so windows can be asserted exactly
    (ref: tests/test_time_slicing.py:11-67)."""

    step_length = 1
    config = None
    root_path = None
    num_grid_points = 1

    def __init__(self, time_values, state_data, forcing_data, is_forecast):
        self._time_values = np.array(time_values)
        self._state_data = np.array(state_data)
        self._forcing_data = np.array(forcing_data)
        self.is_forecast = is_forecast

    def get_num_data_vars(self, category):
        return 1

    def get_dataarray(self, category, split):
        values = {"state": self._state_data, "forcing": self._forcing_data}[category]
        da = FieldArray(
            values[:, None, None].astype(np.float32),
            ("time", "grid_index", f"{category}_feature"),
            {"time": self._time_values},
        )
        return da

    def get_standardization_dataarray(self, category):
        raise NotImplementedError()

    def get_xy(self, category):
        raise NotImplementedError()

    def get_vars_units(self, category):
        raise NotImplementedError()

    def get_vars_names(self, category):
        raise NotImplementedError()

    def get_vars_long_names(self, category):
        raise NotImplementedError()

    @property
    def boundary_mask(self):
        return FieldArray(np.zeros(1, np.float32), ("grid_index",))


ANALYSIS_STATE_VALUES = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]
FORCING_VALUES = [10, 11, 12, 13, 14, 15, 16, 17, 18, 19]


@pytest.mark.parametrize(
    "ar_steps,num_past_forcing_steps,num_future_forcing_steps",
    [[3, 0, 0], [3, 1, 0], [3, 2, 0], [3, 3, 0], [3, 1, 1], [3, 2, 2]],
)
def test_time_slicing_analysis(ar_steps, num_past_forcing_steps,
                               num_future_forcing_steps):
    time_values = np.datetime64("2020-01-01") + np.arange(
        len(ANALYSIS_STATE_VALUES)
    )
    datastore = SinglePointDummyDatastore(
        state_data=ANALYSIS_STATE_VALUES,
        forcing_data=FORCING_VALUES,
        time_values=time_values,
        is_forecast=False,
    )
    dataset = WeatherDataset(
        datastore=datastore,
        ar_steps=ar_steps,
        num_future_forcing_steps=num_future_forcing_steps,
        num_past_forcing_steps=num_past_forcing_steps,
        standardize=False,
    )
    init_states, target_states, forcing, _ = dataset[0]

    expected_init_states = [0, 1]
    expected_target_states = [2, 3, 4]
    key = (num_past_forcing_steps, num_future_forcing_steps)
    if key == (0, 0):
        expected_forcing_values = [[12], [13], [14]]
    elif key == (1, 0):
        expected_forcing_values = [[11, 12], [12, 13], [13, 14]]
    elif key == (2, 0):
        expected_forcing_values = [[10, 11, 12], [11, 12, 13], [12, 13, 14]]
    elif key == (3, 0):
        expected_init_states = [1, 2]
        expected_target_states = [3, 4, 5]
        expected_forcing_values = [
            [10, 11, 12, 13], [11, 12, 13, 14], [12, 13, 14, 15]]
    elif key == (1, 1):
        expected_forcing_values = [
            [11, 12, 13], [12, 13, 14], [13, 14, 15]]
    elif key == (2, 2):
        expected_forcing_values = [
            [10, 11, 12, 13, 14], [11, 12, 13, 14, 15], [12, 13, 14, 15, 16]]

    assert init_states.shape == (2, 1, 1)
    assert init_states[:, 0, 0].tolist() == expected_init_states
    assert target_states.shape == (3, 1, 1)
    assert target_states[:, 0, 0].tolist() == expected_target_states
    assert forcing.shape == (
        3, 1, 1 + num_past_forcing_steps + num_future_forcing_steps
    )
    np.testing.assert_equal(forcing[:, 0, :], np.array(expected_forcing_values,
                                                       dtype=np.float32))


@pytest.mark.parametrize(
    "ar_steps,num_past_forcing_steps,num_future_forcing_steps",
    [[3, 0, 0], [3, 2, 0], [3, 1, 1]],
)
def test_dataset_length_analysis(ar_steps, num_past_forcing_steps,
                                 num_future_forcing_steps):
    """Dataset length arithmetic (ref: weather_dataset.py:156-161)."""
    T = len(ANALYSIS_STATE_VALUES)
    time_values = np.datetime64("2020-01-01") + np.arange(T)
    datastore = SinglePointDummyDatastore(
        state_data=ANALYSIS_STATE_VALUES,
        forcing_data=FORCING_VALUES,
        time_values=time_values,
        is_forecast=False,
    )
    dataset = WeatherDataset(
        datastore=datastore, ar_steps=ar_steps,
        num_past_forcing_steps=num_past_forcing_steps,
        num_future_forcing_steps=num_future_forcing_steps,
        standardize=False,
    )
    expected = (
        T - ar_steps - max(2, num_past_forcing_steps) - num_future_forcing_steps
    )
    assert len(dataset) == expected
    # every sample must be constructible
    for i in range(len(dataset)):
        dataset[i]


class ForecastDummyDatastore(SinglePointDummyDatastore):
    """Forecast-type single-point store: (analysis_time, efd) data."""

    is_forecast = True

    def __init__(self, analysis_times, state_data, forcing_data):
        self._analysis_times = np.array(analysis_times)
        self._state_data = np.array(state_data)  # (A, T_fc)
        self._forcing_data = np.array(forcing_data)
        self.is_ensemble = False

    def get_dataarray(self, category, split):
        values = {"state": self._state_data, "forcing": self._forcing_data}[category]
        efd = (np.arange(values.shape[1]) * np.timedelta64(1, "h")).astype(
            "timedelta64[ns]"
        )
        return FieldArray(
            values[:, :, None, None].astype(np.float32),
            ("analysis_time", "elapsed_forecast_duration", "grid_index",
             f"{category}_feature"),
            {"analysis_time": self._analysis_times.astype("datetime64[ns]"),
             "elapsed_forecast_duration": efd},
        )


def test_time_slicing_forecast():
    """One sample per analysis time, starting at forecast step 2
    (ref: weather_dataset.py:194-213,260-299)."""
    A, T_fc = 3, 8
    state = np.arange(A * T_fc).reshape(A, T_fc)
    forcing = 100 + state
    analysis_times = np.datetime64("2020-01-01") + np.arange(A)
    ds = ForecastDummyDatastore(analysis_times, state, forcing)
    dataset = WeatherDataset(
        datastore=ds, ar_steps=3, num_past_forcing_steps=1,
        num_future_forcing_steps=1, standardize=False,
    )
    assert len(dataset) == A
    init_states, target_states, forcing_w, _ = dataset[1]
    # analysis 1 -> values 8..15; init = fc steps 0,1 -> 8, 9
    assert init_states[:, 0, 0].tolist() == [8, 9]
    assert target_states[:, 0, 0].tolist() == [10, 11, 12]
    # windows around steps 2,3,4 with past=1, future=1
    np.testing.assert_equal(
        forcing_w[:, 0, :],
        np.array([[109, 110, 111], [110, 111, 112], [111, 112, 113]],
                 dtype=np.float32),
    )
