from unified_cvo_tpu.utils.pointcloud import PointCloud
