"""Explicit StructTypes for the engine's domain model.

Derived from the reference's DDL (``cenir.sql``) with the §1.4 type
mapping: serialized-array text columns become first-class ArrayTypes;
"NULL"-string sentinels become real SQL NULLs; the long-tail CSA
metadata map becomes a MapType side column.

Reference: exam ``cenir.sql:33-52``, serie ``cenir.sql:58-108``,
gg_examen ``cenir.sql:114-140``, results_anat ``cenir.sql:150-160``,
quality_serie ``cenir.sql:168-177``.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


EXAM_SCHEMA = T.StructType(
    [
        _f("Eid", T.LongType(), False),
        _f("ExamName", T.StringType()),
        _f("ExamNum", T.IntegerType()),
        _f("MachineName", T.StringType()),
        _f("PatientsName", T.StringType()),
        _f("AcquisitionTime", T.TimestampNTZType()),
        _f("StudyTime", T.TimestampNTZType()),
        _f("ExamDuration", T.IntegerType()),
        _f("PatientsBirthDate", T.DateType()),
        _f("PatientsSex", T.StringType()),  # char(1), default 'O'
        _f("PatientsWeight", T.FloatType()),
        _f("SoftwareVersions", T.StringType()),
        _f("PatientsAge", T.IntegerType()),
        _f("FirstSerieName", T.StringType()),
        _f("LastSerieName", T.StringType()),
        _f("dicom_dir", T.StringType()),
        _f("EUID", T.StringType()),  # StudyInstanceUID
    ]
)

SERIE_SCHEMA = T.StructType(
    [
        _f("Sid", T.LongType(), False),
        _f("ExamRef", T.LongType(), False),  # FK → exam.Eid
        _f("SName", T.StringType()),
        _f("SNumber", T.IntegerType()),
        _f("dimX", T.IntegerType()),
        _f("dimY", T.IntegerType()),
        _f("dimZ", T.IntegerType()),
        _f("dim4", T.IntegerType()),
        _f("sizeX", T.FloatType()),
        _f("sizeY", T.FloatType()),
        _f("sizeZ", T.FloatType()),
        _f("SliceGap", T.FloatType()),
        _f("dimPhase", T.IntegerType()),
        _f("TR", T.FloatType()),
        _f("TE", T.FloatType()),
        _f("FA", T.FloatType()),
        _f("PhaseAngle", T.FloatType()),
        _f("PhaseBw", T.FloatType()),
        # serialized float lists in the reference become real arrays
        _f("TEvec", T.ArrayType(T.DoubleType())),
        _f("TI", T.IntegerType()),
        _f("PhaseDir", T.StringType()),
        _f("PatMode", T.StringType()),
        _f("Orient", T.StringType()),
        _f("ImageType", T.ArrayType(T.StringType())),  # '_'-joined in ref
        _f("corrupt", T.StringType()),
        _f("Affine", T.ArrayType(T.DoubleType())),  # 6 cosines + 3 pos
        _f("DiffBval", T.IntegerType()),
        _f("DiffNbDir", T.IntegerType()),
        _f("CoilName", T.StringType()),
        _f("AcqTime", T.TimestampNTZType()),
        _f("Duration", T.IntegerType()),
        _f("SeqName", T.StringType()),
        _f("SeqName2", T.StringType()),
        _f("SeqType", T.StringType()),
        _f("SliceTime", T.ArrayType(T.DoubleType())),
        _f("slicemode", T.IntegerType()),
        _f("PixelBw", T.IntegerType()),
        _f("TablePos", T.IntegerType()),
        _f("Concat", T.IntegerType()),
        _f("CGating", T.IntegerType()),
        _f("nb_dic_file", T.IntegerType()),
        _f("fsize", T.LongType()),
        _f("dicom_sdir", T.StringType()),
        _f("nifti_dir", T.StringType()),
        _f("nifti_volumes", T.StringType()),
        _f("SUID", T.StringType()),  # SeriesInstanceUID
        # long-tail CSA metadata (dotted keys) — MapType side column
        _f("csa_meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

GG_EXAMEN_SCHEMA = T.StructType(
    [
        _f("crid", T.LongType(), False),
        _f("eid", T.StringType()),
        _f("rid", T.IntegerType()),  # scanner id
        _f("PatientsName", T.StringType()),
        _f("AcquisitionTime", T.TimestampNTZType()),
        _f("ExamDuration", T.IntegerType()),
        _f("PatientsBirthDate", T.DateType()),
        _f("PatientsAge", T.IntegerType()),
        _f("PatientsSex", T.StringType()),
        _f("PatientsWeight", T.FloatType()),
        _f("SoftwareVersions", T.StringType()),
        _f("FirstSerieName", T.StringType()),
        _f("LastSerieName", T.StringType()),
        _f("maj_le", T.TimestampNTZType()),
        _f("relu", T.IntegerType()),
        _f("relu_par", T.StringType()),
        _f("relu_com", T.StringType()),
        _f("relu_date", T.DateType()),
        _f("facturable", T.IntegerType()),
    ]
)

RESULTS_ANAT_SCHEMA = T.StructType(
    [
        _f("Rid", T.LongType(), False),
        _f("Sid", T.LongType(), False),
        _f("status", T.IntegerType()),
        _f("vbmgrayvol", T.FloatType()),
        _f("vbmwhitevol", T.FloatType()),
        _f("vbmcsfvol", T.FloatType()),
        _f("dir_path", T.StringType()),
    ]
)

QUALITY_SERIE_SCHEMA = T.StructType(
    [
        _f("Qid", T.LongType(), False),
        _f("Sid", T.LongType(), False),
        _f("content", T.StringType()),
        _f("reviewby", T.StringType()),
        _f("subj_artefact", T.StringType()),
        _f("phys_artefact", T.StringType()),
    ]
)

# synthetic stand-in for the directory tree (FIXTURES.md §1)
FILE_INVENTORY_SCHEMA = T.StructType(
    [
        _f("path", T.StringType(), False),
        _f("proto", T.StringType()),
        _f("suj", T.StringType()),
        _f("ser", T.StringType()),
        _f("mtime", T.TimestampNTZType()),
        _f("size", T.LongType()),
        _f("InstanceNumber", T.IntegerType()),
        _f("SeriesInstanceUID", T.StringType()),
        _f("SeriesNumber", T.IntegerType()),
        _f("EchoTime", T.DoubleType()),
        _f("ImageOrientationPatient", T.ArrayType(T.DoubleType())),
        _f("AcquisitionDate", T.StringType()),  # raw YYYYMMDD
        _f("AcquisitionTimeRaw", T.StringType()),  # raw HHMMSS.ffffff
        _f("is_dicom", T.BooleanType()),
    ]
)
