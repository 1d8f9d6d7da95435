from hairgs_tpu.io.ply import (
    read_ply,
    write_ply,
    save_gaussian_ply,
    load_gaussian_ply,
    save_hair_ply,
    load_hair_ply,
    store_point_ply,
    fetch_point_ply,
)
from hairgs_tpu.io.colmap import (
    read_extrinsics_binary,
    read_intrinsics_binary,
    read_points3D_binary,
    write_cameras_binary,
    write_images_binary,
    write_points3D_binary,
    qvec2rotmat,
    rotmat2qvec,
    ColmapCamera,
    ColmapImage,
    ColmapPoint3D,
)
from hairgs_tpu.io.npz import (
    HairEvalData,
    HeadReconstruction,
    load_hair_eval_data_npz,
    save_hair_eval_data_npz,
    load_head_reconstruction_data_npz,
    save_head_reconstruction_data_npz,
)
