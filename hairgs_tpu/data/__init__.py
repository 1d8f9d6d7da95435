from hairgs_tpu.data.vision import estimate_orientation_field
from hairgs_tpu.data.cameras import generate_cameras
from hairgs_tpu.data.usc import load_hair_from_usc_dataset
from hairgs_tpu.data.cy import load_hair_from_cy_dataset

hair_data_load_callbacks = {
    "usc_hair_salon": load_hair_from_usc_dataset,
    "cem_yuksel": load_hair_from_cy_dataset,
}
